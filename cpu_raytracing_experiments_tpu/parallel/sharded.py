"""Multi-chip rendering over a jax.sharding.Mesh.

The reference's only parallelism is a shared-memory parallel_for over tiles
(/root/reference/Renderer.hpp:75, SURVEY.md §2.3). Here the same
decomposition is lifted onto a 2-axis device mesh:

  * ``dp`` — pixels. Each chip renders a contiguous slice of the flat pixel
    grid; tiles own disjoint accumulator slices exactly as on CPU, so no
    communication is needed during accumulation. ICI traffic happens only at
    frame assembly (an all_gather of the resolved image).
  * ``sp`` — samples. Each sp rank runs the accumulation passes
    ``acc0 + rank + k*n_sp``; because the RNG is counter-based, the union of
    all ranks' passes is *bit-identical* to a sequential single-chip render,
    and bucket merging is a psum at resolve time.

Everything is expressed with shard_map over the mesh — XLA inserts the
collectives and this same code path runs on N virtual CPU devices in tests
(conftest sets xla_force_host_platform_device_count=8).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render import renderer as _renderer
from ..render.estimator import RenderState
from ..scene.scene import Scene
from ..utils.config import RendererPolicy

try:
    from jax import shard_map as _shard_map_fn

    def shard_map(f, mesh, in_specs, out_specs, check_vma: bool = True):
        # check_vma=False is the documented jax workaround for pallas_call's
        # INTERPRET-mode grid loop, whose internal scan drops the varying-
        # axes annotation and trips the vma type-check (the compiled TPU
        # path type-checks fine; see tests/test_sharding.py pallas test)
        try:
            return _shard_map_fn(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=check_vma)
        except TypeError:  # jax without the check_vma parameter
            return _shard_map_fn(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs)

except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs, check_vma: bool = True):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def make_mesh(dp: Optional[int] = None, sp: int = 1, devices=None) -> Mesh:
    """Build a ('dp', 'sp') mesh. Default: all devices on dp."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if dp is None:
        dp = devices.size // sp
    assert dp * sp == devices.size, (dp, sp, devices.size)
    return Mesh(devices.reshape(dp, sp), ("dp", "sp"))


def create_sharded_state(
    width: int, height: int, policy: RendererPolicy, mesh: Mesh
) -> RenderState:
    """buckets laid out [sp, B, 3, npix]: sp-partial bucket sums sharded over
    'sp', pixels sharded over 'dp'. With light_sampling='restir' a per-pixel
    reservoir buffer [3, npix] rides along, sharded over 'dp' with its
    pixels (temporal reuse is pixel-local; spatial reuse is lane-offset
    based and clips at the shard edge exactly as the single-chip path clips
    at the array edge)."""
    n_sp = mesh.shape["sp"]
    npix = width * height
    assert npix % mesh.shape["dp"] == 0, "pixel count must divide dp axis"
    sharding = NamedSharding(mesh, P("sp", None, None, "dp"))
    buckets = jax.device_put(
        jnp.zeros((n_sp, policy.accumulation_buckets, 3, npix), jnp.float32),
        sharding,
    )
    acc = jax.device_put(
        jnp.uint32(0), NamedSharding(mesh, P())
    )
    reservoir = None
    if policy.light_sampling == "restir":
        assert n_sp == 1, "ReSTIR chains passes sequentially; use sp=1"
        reservoir = jax.device_put(
            RenderState._empty_reservoir(npix),
            NamedSharding(mesh, P(None, "dp")),
        )
    return RenderState(buckets=buckets, accumulations=acc, reservoir=reservoir)


@partial(
    jax.jit,
    static_argnames=("policy", "width", "height", "n", "mesh", "check_vma"),
    donate_argnames=("state",),
)
def accumulate_n_sharded(
    scene: Scene,
    policy: RendererPolicy,
    state: RenderState,
    width: int,
    height: int,
    n: int,
    mesh: Mesh,
    check_vma: bool = True,
) -> RenderState:
    """Run n accumulation passes distributed over the mesh. n must be a
    multiple of the sp axis size; results are bit-identical to n sequential
    single-device passes (same counters, same seeds)."""
    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]
    assert n % n_sp == 0, "pass count must divide sp axis"
    npix = width * height
    local_pix = npix // n_dp
    passes_per_rank = n // n_sp
    use_restir = policy.light_sampling == "restir" and state.reservoir is not None
    if use_restir:
        assert n_sp == 1, "ReSTIR chains passes sequentially; use sp=1"

    def _vary(a, axes=("dp", "sp")):
        # align the fori_loop carry's varying-axes set with render_pass's
        # outputs (which vary over both mesh axes)
        have = getattr(jax.typeof(a), "vma", frozenset())
        missing = tuple(ax for ax in axes if ax not in have)
        if not missing:
            return a
        pc = getattr(jax.lax, "pcast", None)
        return pc(a, missing, to="varying") if pc else jax.lax.pvary(a, missing)

    def local_fn(scene, buckets, acc0, reservoir=None):
        dp = jax.lax.axis_index("dp")
        sp = jax.lax.axis_index("sp")
        pixel_start = dp.astype(jnp.uint32) * jnp.uint32(local_pix)
        # buckets arrives as the local block [1, B, 3, local_pix]
        local = buckets[0]

        def step(k, carry):
            b, res = carry
            acc = (
                acc0
                + jnp.uint32(1)
                + sp.astype(jnp.uint32)
                + jnp.uint32(n_sp) * k.astype(jnp.uint32)
            )
            if use_restir:
                rad, _, res = _renderer.render_pass(
                    scene, policy, acc, width, height,
                    pixel_start=pixel_start, npix=local_pix,
                    vma_axes=("dp", "sp"), restir_in=res,
                )
            else:
                rad, _ = _renderer.render_pass(
                    scene, policy, acc, width, height,
                    pixel_start=pixel_start, npix=local_pix,
                    vma_axes=("dp", "sp"),
                )
            bucket = (acc % jnp.uint32(policy.accumulation_buckets)).astype(jnp.int32)
            return (b.at[bucket].add(jnp.stack([rad.x, rad.y, rad.z], axis=0)),
                    res)

        res0 = _vary(reservoir) if use_restir else jnp.float32(0)
        local, res_fin = jax.lax.fori_loop(
            0, passes_per_rank, step, (local, res0)
        )
        if use_restir:
            # n_sp == 1 in restir mode: the psum is value-identity and marks
            # the reservoir 'sp'-invariant so the P(None, 'dp') out_spec
            # type-checks
            return local[None], jax.lax.psum(res_fin, "sp")
        return local[None]

    if use_restir:
        mapped = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P("sp", None, None, "dp"), P(), P(None, "dp")),
            out_specs=(P("sp", None, None, "dp"), P(None, "dp")),
            check_vma=check_vma,
        )
        buckets, res_out = mapped(
            scene, state.buckets, state.accumulations, state.reservoir
        )
    else:
        mapped = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P("sp", None, None, "dp"), P()),
            out_specs=P("sp", None, None, "dp"),
            check_vma=check_vma,
        )
        buckets = mapped(scene, state.buckets, state.accumulations)
        res_out = None
    return RenderState(
        buckets=buckets,
        accumulations=state.accumulations + jnp.uint32(n),
        reservoir=res_out,
    )


@partial(
    jax.jit,
    static_argnames=("policy", "width", "height", "mesh", "check_vma"),
    donate_argnames=("state",),
)
def accumulate_pixels_sharded(
    scene: Scene,
    policy: RendererPolicy,
    state: RenderState,
    width: int,
    height: int,
    pixel_ids: jnp.ndarray,
    valid: jnp.ndarray,
    mesh: Mesh,
    check_vma: bool = True,
) -> RenderState:
    """One adaptive subset sample, multi-chip: `pixel_ids` [dp, N] GLOBAL
    pixel ids pre-split by owning shard (every valid id in row s must lie
    in shard s's pixel block — the host splitter guarantees it), `valid`
    [dp, N] masks padding. Each shard traces its own sublist and scatters
    into its local bucket/count blocks; no collectives."""
    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]
    assert n_sp == 1, "adaptive subsets chain pass counts; use sp=1"
    npix = width * height
    local_pix = npix // n_dp
    b_count = policy.accumulation_buckets

    def local_fn(scene, buckets, acc0, counts, ids, valid):
        dp = jax.lax.axis_index("dp")
        pixel_start = dp.astype(jnp.int32) * jnp.int32(local_pix)
        local = buckets[0]  # [B, 3, local_pix]
        ids_l = ids[0]
        val_l = valid[0]
        acc = acc0 + jnp.uint32(1)
        rad, _ = _renderer.render_pass_pixels(
            scene, policy, acc, width, ids_l, val_l, vma_axes=("dp", "sp")
        )
        bucket = (acc % jnp.uint32(b_count)).astype(jnp.int32)
        pos = jnp.clip(ids_l.astype(jnp.int32) - pixel_start, 0, local_pix - 1)
        vf = val_l.astype(jnp.float32)
        frame = jnp.zeros((3, local_pix), jnp.float32).at[:, pos].add(
            jnp.stack([rad.x * vf, rad.y * vf, rad.z * vf], axis=0)
        )
        local = jax.lax.dynamic_update_index_in_dim(
            local, local[bucket] + frame, bucket, 0
        )
        return local[None], counts.at[pos].add(vf)

    mapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P("sp", None, None, "dp"), P(), P("dp"),
                  P("dp", None), P("dp", None)),
        out_specs=(P("sp", None, None, "dp"), P("dp")),
        check_vma=check_vma,
    )
    counts = (
        jnp.full((npix,), state.accumulations.astype(jnp.float32))
        if state.counts is None
        else state.counts
    )
    buckets, counts = mapped(
        scene, state.buckets, state.accumulations, counts, pixel_ids, valid
    )
    return RenderState(
        buckets=buckets,
        accumulations=state.accumulations + jnp.uint32(1),
        reservoir=state.reservoir,
        counts=counts,
    )


@partial(
    jax.jit,
    static_argnames=("policy", "width", "height", "tier", "mesh",
                     "check_vma"),
    donate_argnames=("state",),
)
def _adaptive_round_sharded(
    scene: Scene,
    policy: RendererPolicy,
    state: RenderState,
    width: int,
    height: int,
    tol,
    tier: int,
    mesh: Mesh,
    check_vma: bool = True,
):
    """One device-resident adaptive round, multi-chip: each dp shard
    computes the stderr of ITS pixel block from its local buckets/counts,
    picks its own `tier` worst pixels, and traces `buckets` subset passes
    — no collectives, no host round-trip (the previous loop fetched the
    full bucket array and re-split the id list on the host every round).
    Returns (state, n_traced [dp], n_next [dp]); the host reads only these
    small vectors to pick the next tier and stop."""
    from ..render import estimator

    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]
    assert n_sp == 1, "adaptive subsets chain pass counts; use sp=1"
    npix = width * height
    local_pix = npix // n_dp
    b_count = policy.accumulation_buckets

    def local_fn(scene, buckets, acc0, counts):
        dp = jax.lax.axis_index("dp")
        pixel_start = dp.astype(jnp.int32) * jnp.int32(local_pix)
        local = buckets[0]  # [B, 3, local_pix]
        se = estimator.stderr_arrays(local, acc0, counts)
        pos = jnp.argsort(-se)[:tier].astype(jnp.int32)
        val = se[pos] > tol
        ids_g = (pos + pixel_start).astype(jnp.uint32)
        n_traced = jnp.sum(val.astype(jnp.int32))
        vf = val.astype(jnp.float32)
        for k in range(b_count):
            acc = acc0 + jnp.uint32(k + 1)
            rad, _ = _renderer.render_pass_pixels(
                scene, policy, acc, width, ids_g, val, vma_axes=("dp", "sp")
            )
            bucket = (acc % jnp.uint32(b_count)).astype(jnp.int32)
            frame = jnp.zeros((3, local_pix), jnp.float32).at[:, pos].add(
                jnp.stack([rad.x * vf, rad.y * vf, rad.z * vf], axis=0)
            )
            local = jax.lax.dynamic_update_index_in_dim(
                local, local[bucket] + frame, bucket, 0
            )
        counts = counts.at[pos].add(vf * b_count)
        se2 = estimator.stderr_arrays(
            local, acc0 + jnp.uint32(b_count), counts
        )
        n_next = jnp.sum((se2 > tol).astype(jnp.int32))
        # counts / the active-count scalars derive from the sp-varying
        # bucket input (unlike accumulate_pixels_sharded, whose id lists
        # come sp-replicated from the host), so a psum over the size-1
        # 'sp' axis is needed to make their sp-replication provable to
        # check_vma (value-identity: n_sp == 1 is asserted above)
        counts = jax.lax.psum(counts, "sp")
        n_traced = jax.lax.psum(n_traced, "sp")
        n_next = jax.lax.psum(n_next, "sp")
        return local[None], counts, n_traced[None], n_next[None]

    mapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P("sp", None, None, "dp"), P(), P("dp")),
        out_specs=(P("sp", None, None, "dp"), P("dp"), P("dp"), P("dp")),
        check_vma=check_vma,
    )
    counts = (
        jnp.full((npix,), state.accumulations.astype(jnp.float32))
        if state.counts is None
        else state.counts
    )
    buckets, counts, n_traced, n_next = mapped(
        scene, state.buckets, state.accumulations, counts
    )
    state = RenderState(
        buckets=buckets,
        accumulations=state.accumulations + jnp.uint32(b_count),
        reservoir=state.reservoir,
        counts=counts,
    )
    return state, n_traced, n_next


@partial(
    jax.jit,
    static_argnames=("policy", "width", "height", "tonemap"),
)
def resolve_sharded(
    state: RenderState,
    policy: RendererPolicy,
    exposure,
    width: int,
    height: int,
    tonemap: bool = True,
) -> jnp.ndarray:
    """Merge sp-partial buckets (psum across 'sp' happens via the sum over
    the leading axis — XLA turns it into a collective), then delegate to the
    single-device estimator.resolve so the two paths can never diverge
    (same median branches, same exposure/(rounds*spp) scale); the frame is
    assembled via an all_gather over 'dp'."""
    from ..render import estimator

    merged = jnp.sum(state.buckets, axis=0)  # [B, 3, npix]
    return estimator.resolve(
        RenderState(buckets=merged, accumulations=state.accumulations,
                    counts=state.counts),
        policy, exposure, width, height, tonemap,
    )


class ShardedRenderer:
    """Mesh-parallel progressive renderer with the same API as render.api.
    Renderer — the multi-chip production path."""

    def __init__(
        self,
        scene: Scene,
        policy: Optional[RendererPolicy] = None,
        width: int = 256,
        height: int = 256,
        mesh: Optional[Mesh] = None,
        check_vma: bool = True,
    ):
        import dataclasses

        self.policy = policy or RendererPolicy()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.check_vma = check_vma
        self.width, self.height = width, height
        if (
            float(scene.camera.half_width) * 2 != width
            or float(scene.camera.half_height) * 2 != height
        ):
            scene = dataclasses.replace(scene, camera=scene.camera.resized(width, height))
        self.scene = scene
        self.state = create_sharded_state(width, height, self.policy, self.mesh)

    def reset_accumulator(self):
        self.state = create_sharded_state(
            self.width, self.height, self.policy, self.mesh
        )

    def accumulate(self, n: int):
        self.state = accumulate_n_sharded(
            self.scene, self.policy, self.state, self.width, self.height, n,
            self.mesh, check_vma=self.check_vma,
        )

    def render(self, tonemap: bool = True) -> np.ndarray:
        img = resolve_sharded(
            self.state, self.policy, self.scene.camera.exposure,
            self.width, self.height, tonemap,
        )
        return np.asarray(img)[::-1]

    def variance_map(self) -> np.ndarray:
        """[H, W] per-pixel variance of the running mean from the merged
        bucket spread — same statistic as render.api.Renderer.variance_map,
        so denoise.denoise_render and the adaptive tooling work unchanged
        on the sharded renderer. Row 0 = top scanline."""
        from ..utils.metrics import pixel_variance_map

        merged = np.asarray(self.state.buckets).sum(axis=0)
        v = pixel_variance_map(merged, int(self.state.accumulations))
        return v.reshape(self.height, self.width)[::-1]

    def save_checkpoint(self, path):
        """Topology-independent checkpoint: the sp-partial buckets are
        merged to the single-device layout [B, 3, npix] before saving, so a
        render checkpointed on an N-chip mesh resumes on ANY topology —
        M chips, a different dp/sp split, or a single device (render/
        checkpoint.py's bit-exact-resume guarantee carries over: the RNG is
        counter-based and the accumulation counter is global)."""
        from ..render import checkpoint

        merged = jnp.sum(self.state.buckets, axis=0)
        st = RenderState(
            buckets=merged,
            accumulations=self.state.accumulations,
            reservoir=self.state.reservoir,
            counts=self.state.counts,
        )
        checkpoint.save(path, st, self.policy, self.width, self.height)

    def load_checkpoint(self, path):
        """Resume from any checkpoint (single-device or sharded origin):
        merged buckets land in sp rank 0's partial slot (zeros elsewhere —
        the resolve sums over sp, so this is exact) and pixel-indexed state
        re-shards over dp."""
        from ..render import checkpoint

        st = checkpoint.load(path, self.policy, self.width, self.height)
        n_sp = self.mesh.shape["sp"]
        buckets = st.buckets[None]
        if n_sp > 1:
            buckets = jnp.concatenate(
                [buckets,
                 jnp.zeros((n_sp - 1,) + st.buckets.shape, jnp.float32)],
                axis=0,
            )
        self.state = RenderState(
            buckets=jax.device_put(
                buckets, NamedSharding(self.mesh, P("sp", None, None, "dp"))
            ),
            accumulations=st.accumulations,
            reservoir=(
                None
                if st.reservoir is None
                else jax.device_put(
                    st.reservoir, NamedSharding(self.mesh, P(None, "dp"))
                )
            ),
            counts=(
                None
                if st.counts is None
                else jax.device_put(
                    st.counts, NamedSharding(self.mesh, P("dp"))
                )
            ),
        )

    def render_adaptive(self, tol: float, max_spp: int = 10000,
                        warmup=None, tonemap: bool = True):
        """Multi-chip per-pixel adaptive allocation, device-resident
        (round 3): each dp shard computes the stderr of its own pixel
        block, picks its `tier` worst pixels, and traces the whole round's
        subset passes inside ONE dispatch (_adaptive_round_sharded — no
        collectives); the host reads only the per-shard active counts to
        size the next round and stop. The per-round subset may differ from
        single-chip (selection is per shard here, global there), so images
        agree in distribution, not bit-for-bit."""
        assert self.mesh.shape["sp"] == 1, "adaptive requires sp=1"
        n_dp = self.mesh.shape["dp"]
        b = self.policy.accumulation_buckets
        npix = self.width * self.height
        local_pix = npix // n_dp
        warmup = -(-(warmup or 4 * b) // b) * b
        self.accumulate(warmup)
        traced = warmup * npix
        tiers = []
        t = local_pix
        while t >= max(local_pix // 64, 32):
            tiers.append(t)
            t //= 2
        tol_j = jnp.float32(tol)
        n_max = local_pix
        while int(self.state.accumulations) < max_spp:
            if n_max == 0:
                break
            tier = next((t for t in reversed(tiers) if t >= n_max), local_pix)
            self.state, n_traced, n_next = _adaptive_round_sharded(
                self.scene, self.policy, self.state, self.width,
                self.height, tol_j, tier, self.mesh,
                check_vma=self.check_vma,
            )
            traced += b * int(np.asarray(n_traced).sum())
            n_max = int(np.asarray(n_next).max())
        img = self.render(tonemap=tonemap)
        uniform_equiv = int(self.state.accumulations) * npix
        counts = (
            np.asarray(self.state.counts)
            if self.state.counts is not None
            else np.full(npix, float(self.state.accumulations))
        )
        stats = {
            "samples_traced": int(traced),
            "uniform_equivalent": int(uniform_equiv),
            "saved_fraction": 1.0 - traced / max(uniform_equiv, 1),
            "max_spp_pixel": float(counts.max()),
        }
        return img, stats

    def render_spp(self, spp: int, tonemap: bool = True) -> np.ndarray:
        """Accumulate until at least `spp` total samples/pixel have been
        traced (each pass traces policy.samples_per_pixel of them), rounded
        up so passes divide both the bucket count and the sp axis."""
        b = self.policy.accumulation_buckets
        n_sp = self.mesh.shape["sp"]
        import math

        unit = b * n_sp // math.gcd(b, n_sp)
        passes = -(-spp // self.policy.samples_per_pixel)
        n = -(-passes // unit) * unit
        self.accumulate(n)
        return self.render(tonemap=tonemap)
