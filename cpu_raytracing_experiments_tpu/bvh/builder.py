"""BVH construction: native C++ full-sweep SAH (native/bvh_builder.cpp) with
a numpy binned-SAH fallback. Build happens host-side at scene build/edit
time (cold path — the reference rebuilds on geometry edits,
Application.cpp:508); the flattened node arrays are device-resident and
consumed by bvh/traverse.py.
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec3
from ..utils import native


def _pytree_dataclass(cls, meta=()):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls) if f.name not in meta]
    jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=list(meta)
    )
    return cls


@lambda cls: _pytree_dataclass(cls, meta=("max_leaf",))
class BVHArrays:
    """Flattened *threaded* BVH (node layout of /root/reference/
    BVH.hpp:18-33, SoA, plus a skip link): inner nodes have first = index of
    first child (children adjacent); leaves have count > 0 and first = first
    primitive (prims pre-reordered). ``miss`` threads the depth-first order:
    the node to visit when this node's AABB is missed (or after its leaf is
    processed); -1 terminates. This makes on-device traversal STACKLESS —
    per-ray state is a single node cursor, the TPU-native replacement for
    the reference's per-stream traversal stack (BVH.hpp:319-359)."""

    node_min: Vec3  # [N]
    node_max: Vec3  # [N]
    first: jnp.ndarray  # [N] int32
    count: jnp.ndarray  # [N] int32
    miss: jnp.ndarray  # [N] int32 skip link
    max_leaf: int = 1  # static: max prims in any leaf

    @property
    def num_nodes(self) -> int:
        return int(self.first.shape[0])


def _build_numpy(mins: np.ndarray, maxs: np.ndarray, leaf_size: int = 1):
    """Binned-SAH fallback builder (pure numpy, iterative)."""
    n = mins.shape[0]
    cent = 0.5 * (mins + maxs)
    order = np.arange(n, dtype=np.uint32)
    node_min, node_max, first, count = [], [], [], []

    def half_area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    stack = [(0, n, None)]  # (begin, end, parent_slot)
    # allocate root
    node_min.append(None)
    node_max.append(None)
    first.append(0)
    count.append(0)
    stack = [(0, n, 0)]
    while stack:
        begin, end, slot = stack.pop()
        ids = order[begin:end]
        lo = mins[ids].min(axis=0)
        hi = maxs[ids].max(axis=0)
        node_min[slot] = lo
        node_max[slot] = hi
        m = end - begin
        if m <= leaf_size:
            first[slot] = begin
            count[slot] = m
            continue
        # binned SAH over the largest axis
        axis = int(np.argmax(hi - lo))
        c = cent[ids, axis]
        cmin, cmax = c.min(), c.max()
        if cmax - cmin < 1e-12:
            split = m // 2
            part = np.argsort(c, kind="stable")
        else:
            nbins = min(16, m)
            bins = np.minimum(
                ((c - cmin) / (cmax - cmin) * nbins).astype(np.int32), nbins - 1
            )
            best_cost, best_b = np.inf, nbins // 2
            for b in range(1, nbins):
                l_mask = bins < b
                nl = int(l_mask.sum())
                if nl == 0 or nl == m:
                    continue
                la = half_area(mins[ids[l_mask]].min(0), maxs[ids[l_mask]].max(0))
                ra = half_area(mins[ids[~l_mask]].min(0), maxs[ids[~l_mask]].max(0))
                cost = la * nl + ra * (m - nl)
                if cost < best_cost:
                    best_cost, best_b = cost, b
            l_mask = bins < best_b
            if l_mask.sum() in (0, m):
                split = m // 2
                part = np.argsort(c, kind="stable")
            else:
                part = np.argsort(~l_mask, kind="stable")  # left first
                split = int(l_mask.sum())
        order[begin:end] = ids[part]
        child = len(first)
        first[slot] = child
        count[slot] = 0
        for _ in range(2):
            node_min.append(None)
            node_max.append(None)
            first.append(0)
            count.append(0)
        stack.append((begin, begin + split, child))
        stack.append((begin + split, end, child + 1))
    return (
        np.asarray(node_min, np.float32),
        np.asarray(node_max, np.float32),
        np.asarray(first, np.uint32),
        np.asarray(count, np.uint32),
        order,
    )


def compute_miss_links(first: np.ndarray, count: np.ndarray) -> np.ndarray:
    """Thread the tree: miss[n] = next node in depth-first order when n's
    subtree is skipped/finished; -1 at the end. Children are adjacent
    (first, first+1) and visited in stored order (the reference leaves
    traversal ordering as a TODO too, BVH.hpp:340)."""
    n = first.shape[0]
    miss = np.full(n, -1, np.int64)
    stack = [(0, -1)]
    while stack:
        node, after = stack.pop()
        miss[node] = after
        if count[node] == 0:  # inner
            c0 = int(first[node])
            stack.append((c0 + 1, after))
            stack.append((c0, c0 + 1))
    return miss.astype(np.int32)


def build_bvh(
    mins: np.ndarray, maxs: np.ndarray, leaf_size: int = 1
) -> tuple:
    """Build a threaded BVH over primitive AABBs. Returns
    (BVHArrays, prim_order); callers must reorder their primitive arrays by
    prim_order so leaves index directly (the reference's final reorder,
    BVH.hpp:201-205)."""
    mins = np.asarray(mins, np.float32)
    maxs = np.asarray(maxs, np.float32)
    res = native.bvh_build(mins, maxs, leaf_size=leaf_size)
    if res is None:
        res = _build_numpy(mins, maxs, leaf_size=leaf_size)
    node_min, node_max, first, count, order = res
    miss = compute_miss_links(first, count)
    max_leaf = int(count.max()) if count.size else 1
    arrays = BVHArrays(
        node_min=Vec3(
            jnp.asarray(node_min[:, 0]),
            jnp.asarray(node_min[:, 1]),
            jnp.asarray(node_min[:, 2]),
        ),
        node_max=Vec3(
            jnp.asarray(node_max[:, 0]),
            jnp.asarray(node_max[:, 1]),
            jnp.asarray(node_max[:, 2]),
        ),
        first=jnp.asarray(first.astype(np.int32)),
        count=jnp.asarray(count.astype(np.int32)),
        miss=jnp.asarray(miss),
        max_leaf=max(max_leaf, 1),
    )
    return arrays, order


def sphere_bounds(centers: np.ndarray, radii: np.ndarray):
    r = radii[:, None]
    return centers - r, centers + r


def triangle_bounds(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray):
    mins = np.minimum(np.minimum(v0, v1), v2)
    maxs = np.maximum(np.maximum(v0, v1), v2)
    return mins, maxs
