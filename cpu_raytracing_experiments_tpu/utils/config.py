"""Renderer configuration.

The reference configures itself with compile-time template knobs
(``RendererPolicy`` NTTPs, /root/reference/Renderer.hpp:19-26) plus
preprocessor switches (``BRDF``, ``MIS``, ``USEBVH``, ``MEDIAN``,
Renderer.hpp:70-71, BVH.hpp:307, Renderer.hpp:450). Here those become one
frozen dataclass resolved at *trace time*: every field is a static Python
value, so each knob combination compiles to its own specialized XLA
executable with zero runtime branching — the exact analog of the NTTP
design, but driven from config/CLI instead of recompiling C++.
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RendererPolicy:
    """Static render-policy knobs (Renderer.hpp:19-26 + macro switches)."""

    log_tile: int = 4  # tiles of (2^log_tile)^2 pixels; only affects the RNG
    # seed schedule (kept for bit-parity with the reference's
    # per-tile path indexing, Renderer.hpp:107)
    samples_per_pixel: int = 1  # per accumulate pass (reference: fixed 1)
    max_material_id: int = 64
    max_bounces: int = 16
    max_radiance: float = 1e2  # per-sample radiance clamp ceiling. The
    # reference declares this knob but never applies it (Renderer.hpp:25 is
    # its only occurrence); here clamp_radiance=True makes it live.
    clamp_radiance: bool = False  # clamp per-pass radiance to max_radiance
    # (biased firefly control, complements the median-of-means estimator)
    accumulation_buckets: int = 5  # median-of-means buckets (Renderer.hpp:41)

    brdf: str = "lambertian"  # 'lambertian' | 'ggx' (#define BRDF 0|1) |
    # 'principled' (full material model: diffuse + specular + transmission —
    # consumes the Material fields the reference declares but never shades)
    shade_f80: bool = True  # two-point Schlick Fresnel lerp(F0 -> F80) in the
    # specular closures. The reference declares Material::F80 and its scenes
    # set it (Primitives.hpp:22, Application.cpp:69-99) but no shader reads
    # it; False reproduces that dead-field behavior (classic Schlick, F80
    # treated as white).
    mis: bool = True  # #define MIS true
    light_sampling: str = "uniform"  # 'uniform' (reference, Renderer.hpp:259)
    # | 'power' — per-ray categorical selection proportional to emission x
    # solid angle, the improvement the reference marks "COSA A INVESTIGAR"
    # (Renderer.hpp:260); unbiased (exact selection pdf feeds the same MIS)
    # | 'alias' — O(1) Vose alias-table selection over STATIC power weights
    # (emission x size, no distance term): the scalable many-light mode —
    # 'power' builds an [R, L] matrix twice per bounce; falls back to
    # 'power' behavior when the scene carries no LightAlias table
    # | 'ris' — M-candidate resampled importance sampling (the reference's
    # dormant ReSTIR hook, Sampling.hpp:25-73); NEE-only direct light
    # | 'restir' — RIS + ReSTIR-style temporal reuse (per-pixel reservoir
    # carried across accumulation passes) and spatial reuse (neighbor
    # reservoirs combined, Sampling.hpp:56-73 CombineReservoirs) on the
    # PRIMARY hit; secondary bounces fall back to plain RIS
    use_bvh: bool = False  # #define USEBVH false (reference ships brute force)
    accel: str = "brute"  # 'brute' | 'bvh' (threaded) | 'grid' (DDA) |
    # 'clustered' (morton clusters + lax.cond-skipped dense batteries) |
    # 'pallas' (the Pallas clustered-traversal kernel with per-tile sorted
    # visit lists + alive compaction — the large-scene production backend,
    # ops/pallas/traverse_kernel.py); use_bvh=True is an alias for accel='bvh'
    pallas_mxu: bool = False  # triangle narrow phase as [R,3]x[3,3K] MXU
    # matmuls inside the traversal kernel (precision=HIGHEST); experimental
    pallas_plan: str = "ray"  # broad phase: 'ray' = per-ray slab battery
    # over all C clusters (production default at every measured scale);
    # 'super' = two-level — slab battery over ceil(C/128) supercluster
    # union boxes first, then cond-gated per-cluster refinement of entered
    # supers (bit-identical visit lists; MEASURED NEGATIVE at 384x384
    # (100k C=1130 54.0 vs 48.0 ms/pass, C=2217 58.5 vs 50.3) AND at 4K
    # widths (round-4 T=4096 A/B: slower in plan and walk at both bounce
    # states, flat plan only 10-18% of traversal cost) — the walk
    # dominates everywhere; benchmarks/RESULTS.md supercluster A/Bs);
    # 'tilebox' = conservative per-tile interval slab test (~TILE_R x less
    # planning compute, superset visit lists); 'group' = per-LEAF culling
    # for fill-packed rows (scene built with group_boxes=True clustering):
    # the row entry is the min of the two packed leaves' box entries, so
    # rows cull as tightly as unpacked leaves while the walk sees fewer,
    # fuller rows (falls back to 'ray' when the pack has no group boxes)
    pallas_tile_rays: object = "auto"  # rays per kernel tile (accel='pallas'):
    # int | 'auto' = 128 below 512 clusters, else 256 (mesh_ab measured:
    # 20k tris C=232 tile=128 wins +8%, 100k tris C=1134 tile=256 wins +7%)
    pallas_sort_visits: bool = True  # front-to-back per-tile cluster order
    pallas_sort_impl: str = "kernel"  # where the per-tile visit order is
    # built: 'kernel' = vectorized selection sort inside the planner pallas
    # program (bit-identical, ~20x cheaper); 'xla' = argsort +
    # take_along_axis outside (the measured-slow reference path, kept for
    # A/B and for the tilebox/hybrid planners, which always use it)
    pallas_compact: bool = False  # alive-first ray compaction before traversal
    # (measured SLOWER on v5e: the gather/scatter of ray SoA costs ~25 ms per
    # traversal at 262k rays; per-ray-masked visit planning already skips
    # dead lanes' clusters without reordering — see ARCHITECTURE.md)
    pallas_interpret: bool = False  # run the kernel in the Pallas interpreter
    # (CPU CI only; compiled Mosaic on TPU)
    pallas_plan_block: int = 8  # ray-tiles planned per planner program
    # (multiple of 8): larger blocks amortize the planner's per-program
    # fixed cost (block copies + grid bookkeeping, measured ~4.8 us/tile vs
    # ~0.3 us of battery at the 20k config); bit-exact knob
    pallas_unroll: int = 1  # cluster visits per traversal-loop trip
    # (1|2|4|8): fewer while-loop control round-trips per visit; each extra
    # visit stays gated on the sorted-entry early-exit test, so results are
    # bit-exact (tests/test_pallas_traverse.py)
    pallas_fuse: object = "auto"  # fused visits: False/0 serial, True/2
    # paired, 4 quad — that many clusters' batteries concatenate into one
    # [TILE_R, fuse*K] block (one min/min-iota reduction + one select
    # epilogue per TRIP) and the running hit state rides the while-loop
    # carry instead of VMEM refs; bit-exact (excludes pallas_unroll > 1).
    # 'auto' (default) picks 4 below K=256, else 2, and engages
    # trav_block=8 — the measured-best schedule (benchmarks/RESULTS.md)
    pallas_trav_block: int = 1  # ray-tiles walked per traversal program
    # (1|8): 8 = one whole SMEM visit-list block per program, amortizing
    # per-program fixed cost (a zero-work traversal measures ~5 us/tile);
    # bit-exact knob
    pallas_exit_refresh: int = 8  # visits between early-exit bound
    # refreshes in the traversal walk (8|16|32|64). Each refresh is a
    # cross-sublane max -> SMEM write the scalar cond then reads — a
    # VPU->scalar sync that caps how far the scalar unit runs ahead of the
    # batteries. Larger = fewer syncs, staler (always conservative) exit
    # bound; bit-exact knob (extra visits past the bound can't change hits)
    pallas_prefetch: bool = False  # carry the NEXT trip's visit/entry
    # scalars in the walk-loop state, fetched at the end of the previous
    # trip, so cluster addresses are ready before the batteries drain and
    # the loop cond tests a carried scalar instead of a fresh SMEM load.
    # Fused-visit modes only (serial walks ignore it); bit-exact knob —
    # visit/entry are loop-invariant and mx reads keep their program points
    pallas_stream: object = "auto"  # True | False | 'auto': keep cluster
    # attribute tables in HBM and DMA each visit's rows into a
    # double-buffered VMEM scratch (prefetching one cluster ahead) instead
    # of holding [C, K] planes VMEM-resident. Lifts the scene-size ceiling
    # (~1.3M tris at 48 B/tri against the 64 MB VMEM grant) to HBM scale.
    # 'auto' = stream only packs whose tables exceed PALLAS_STREAM_BYTES
    # (ops/intersect.py); bit-exact knob (tests/test_pallas_traverse.py).
    # Excludes mxu/fuse/unroll/trav_block (auto drops them per-pack).
    primary_accel: Optional[str] = None  # accel override for bounce 0 only
    # (the coherent primary intersection + its NEE shadow trace): e.g.
    # accel='brute', primary_accel='pallas' runs the tile-culled clustered
    # traversal on camera rays — where screen-tile frustums cull well even
    # in scenes whose incoherent bounces favor the dense battery (the
    # sphere-field regime, ARCHITECTURE.md crossover table) — and the brute
    # battery on bounces >= 1. None = same as accel. Bit-exact: every accel
    # backend returns identical hits (tests/test_pallas_traverse.py).
    # Note ray_order='auto' resolves to 'tile' when either accel is pallas;
    # renders are order-invariant EXCEPT ReSTIR's lane-offset spatial
    # neighborhoods (equal in distribution; pin ray_order='raster' for
    # bitwise comparison against a raster-order run).
    ray_order: str = "auto"  # 'auto' | 'tile' | 'raster': process rays in 16x16
    # pixel-tile order (the reference's tile decomposition, Renderer.hpp:75)
    # so each Pallas traversal tile sees a compact screen footprint — bounce
    # origins then cluster tightly and tile-level culling keeps working off
    # the primary hit. A static position->pixel permutation at raygen + one
    # gather at pass end; RNG is keyed by pixel id, so renders are
    # bit-identical either way. 'auto' = 'tile' for accel='pallas' (where
    # traversal-tile coherence pays), 'raster' otherwise (the permutation
    # gathers are pure overhead for the dense battery).
    median: bool = True  # #define MEDIAN true (median vs average resolve)
    narrow_wavefront: object = "auto"  # True | False | 'auto': two-phase bounce
    # loop — once the live-ray
    # count fits in 1/narrow_factor of the launch width, compact alive rays
    # to the front (stable -> screen-tile coherence survives) and finish the
    # tail bounces on the narrow array. The reference compacts EVERY bounce
    # (Renderer.hpp:357-404, 431); on TPU per-bounce scatters cost more than
    # masked-dense math, but the late-bounce tail (alive ~1-2% of lanes by
    # bounce 3, measured) still pays full-width plan/shade cost without this.
    # 'auto' engages when the compaction overhead is measured to pay for
    # itself: wide launches (>= 2^19 rays), expensive batteries (>= 64
    # prims), or the pallas traversal backend; small cheap scenes (hero,
    # cornell) measured ~3 ms/pass SLOWER with narrowing and skip it.
    narrow_factors: tuple = (4, 32)  # cascade of narrow widths (launch
    # width divided by each factor in turn; a stage engages once the live
    # count fits). (4, 32) measured best on the mesh configs: 71.6 -> ~40
    # ms/pass at 384x384.

    # TPU-specific execution knobs (no reference equivalent):
    passes_per_launch: object = "auto"  # int | 'auto': accumulation passes
    # traced per wavefront launch (estimator.accumulate_n). Small frames
    # leave the VPU idle between op launches (65k-lane hero passes measured
    # ~3 ms while 524k-lane passes of 8x the work cost ~6 ms); batching k
    # passes into one launch with per-lane accumulation indices is
    # BIT-IDENTICAL to sequential passes (counter RNG) and amortizes the
    # fixed overhead. 'auto' = fill rays_per_chunk, cap 8; restir forces 1
    # (its reservoir chain is inherently sequential).
    rays_per_chunk: int = 1 << 19  # microbatch size for the wavefront loop
    # (2^19 measured fastest on v5e at 1080p: 84 Msamples/s vs 75 at 2^18);
    # bounds the [rays x prims] intersection working set to fit on-chip.
    # NOTE: whether a launch runs inline (fits one chunk) or through the
    # lax.map microbatch loop changes XLA's fusion context, which rounds a
    # few floats differently; Russian-roulette threshold flips then diverge
    # the affected pixels' paths entirely. Determinism/resume/sharding
    # bit-exactness holds for a FIXED schedule (same chunking, same
    # passes_per_launch); schedule changes are equal only in distribution.
    sky_bug_compat: bool = False  # reproduce Renderer.hpp:416-418 (throughput.r
    # multiplies all three sky channels) for bit-compatibility testing
    russian_roulette: bool = True
    stratify_camera: bool = False  # low-discrepancy camera jitter: van der
    # Corput sequence over the accumulation index with per-pixel
    # Cranley-Patterson rotation — the design the reference sketches but
    # never lands (bitreverse(accumulations) captured unused,
    # Renderer.hpp:80; 'sobol with cransley rotation' note, :254)
    rng_scramble: bool = False  # apply a hash_u32 avalanche pass to each RNG
    # site state. The reference's hash_2d (Random.hpp:45-50) is an LCG-style
    # hash with lattice structure over the arithmetic seed progression,
    # which shows as faint diagonal screen-space banding in smooth
    # sky/occlusion lighting (visible in many-sphere scenes; the reference
    # has the same artifact). False = bit-parity with the reference;
    # True = scrambled, banding-free.
    restir_temporal_cap: int = 2  # temporal reservoir count clamp, in units
    # of RIS_CANDIDATES. Short on purpose: in a PROGRESSIVE ACCUMULATOR,
    # long temporal memory correlates consecutive passes' NEE samples and
    # slows the 1/N average (measured: cap=20 is ~15% WORSE MSE than plain
    # RIS on a 326-light scene; cap=2 with spatial=4 is ~6% better) -
    # real-time ReSTIR wants long memory, offline accumulation wants short
    restir_spatial: int = 4  # spatial neighbor reservoirs merged per pass
    restir_radius: int = 2  # 2-D spatial neighborhood radius IN PIXELS:
    # default 2 is MEASURED (convergence_restir_2d.py, r5b.log): r=2 beats
    # r=8 at every spp point (10/50/250 spp MSE 5.19/2.66/1.98 vs
    # 5.41/2.87/2.05) and r=16 is worse still — close neighbors see the
    # same light set; far ones dilute the reservoir even when geometry
    # agrees. Mechanics:
    # each spatial candidate draws (dx, dy) uniformly from the
    # [-radius, radius]^2 box around the pixel (true screen-space
    # neighbors; the neighbor's lane is recovered from the ray-order key
    # and self-verified — renderer._select_light_restir). Paths without
    # per-lane pixel coords (render_pass_pixels) fall back to 1-D
    # lane-offset neighbors at this radius in ray-array order.
    restir_spatial_2d: bool = True  # True = 2-D screen-space spatial
    # neighborhood (round 3, self-verified coordinate gather); False =
    # the round-2 1-D lane-offset neighborhood in ray-array order.
    # MEASURED default (round-5 curves, benchmarks/CONVERGENCE.md 2-D
    # section): at the r=2 radius the 2-D box beats the 1-D variant and
    # plain RIS at 50 and 250 spp and ties them at 10
    restir_reject: bool = True  # geometry-similarity rejection of spatial
    # neighbors: reuse only when normals agree within ~25 deg AND hit
    # distances within 10% — the standard ReSTIR guard against reusing
    # across depth/orientation discontinuities (silhouettes, floor/object
    # boundaries), where a neighbor's light choice is near-useless and
    # dilutes the reservoir
    enable_dof: bool = False  # thin-lens depth of field: the reference declares
    # aperture/focus (Camera.hpp:17-26) but never uses them in generate_ray;
    # we implement real DoF behind this switch

    @property
    def effective_accel(self) -> str:
        return "bvh" if (self.use_bvh and self.accel == "brute") else self.accel

    @property
    def tile_root(self) -> int:
        return 1 << self.log_tile

    @property
    def tile_size(self) -> int:
        return self.tile_root * self.tile_root

    def __post_init__(self):
        assert self.brdf in ("lambertian", "ggx", "principled"), self.brdf
        assert self.accel in ("brute", "bvh", "grid", "clustered", "pallas"), self.accel
        assert self.light_sampling in (
            "uniform", "power", "alias", "ris", "restir"
        ), self.light_sampling
        assert self.accumulation_buckets % 2 == 1, "median needs odd buckets"
        assert self.pallas_unroll in (1, 2, 4, 8), self.pallas_unroll
        assert self.pallas_sort_impl in ("kernel", "xla"), (
            self.pallas_sort_impl)
        assert self.pallas_fuse in (False, True, 0, 2, 4, "auto"), (
            self.pallas_fuse)
        assert not (self.pallas_fuse and self.pallas_fuse != "auto"
                    and self.pallas_unroll != 1), (
            "pallas_fuse replaces the unroll schedule (fused visits)"
        )
        assert self.pallas_trav_block in (1, 8), self.pallas_trav_block
        assert self.pallas_exit_refresh in (8, 16, 32, 64), (
            self.pallas_exit_refresh)
        assert self.pallas_prefetch in (True, False), self.pallas_prefetch
        assert self.pallas_stream in (True, False, "auto"), self.pallas_stream
        assert self.primary_accel in (
            None, "brute", "bvh", "grid", "clustered", "pallas"
        ), self.primary_accel
        if self.pallas_stream is True:
            # 'auto' fuse is fine: it resolves to off for streaming packs
            assert not (self.pallas_mxu
                        or (self.pallas_fuse
                            and self.pallas_fuse != "auto")
                        or self.pallas_unroll != 1
                        or self.pallas_trav_block != 1), (
                "pallas_stream=True excludes mxu/fuse/unroll/trav_block "
                "(the streaming kernel has its own visit schedule)"
            )


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    """How to lay the render over a device mesh (no reference equivalent —
    the reference is single-process, SURVEY.md §2.3)."""

    data_axis: str = "dp"  # pixels sharded over this axis
    sample_axis: Optional[str] = None  # optional spp-sharding axis ('sp')


def tuned_policy(width: int, height: int, **overrides) -> RendererPolicy:
    """Measured-defaults helper. Currently identical to the defaults:
    a v5e sweep (benchmarks/RESULTS.md, spp-per-pass table) measured
    samples_per_pixel=1 fastest at EVERY frame size — the spp>1 path's
    reshape/sum epilogue costs more than any occupancy gain (an earlier
    informal +40% reading did not reproduce). Multi-spp passes remain
    supported for convergence workflows; don't enable them for speed."""
    del width, height  # kept for call-site stability; nothing size-tuned now
    return RendererPolicy(**overrides)


DEFAULT_POLICY = RendererPolicy()
