"""Pallas TPU closest-hit kernel with cluster culling.

TPU-native replacement for the WGSL intersection scan
(shaders/ray_tracer.wgsl:149-185), evolved from brute force into a
two-level scheme — the TPU answer to a BVH, built around what the hardware
rewards (dense 8×128 SIMD tiles, compiler-visible control flow) instead of
per-thread stack traversal (which would need per-lane gathers TPUs don't
have):

  * grid over ray blocks: each grid step loads ``step_tiles`` cull tiles of
    RT=128 rays (lane axis); the whole scene (SoA planes) is VMEM-resident
    (teapot ≈ 1 MB packed << 16 MB VMEM), so per-pair values never touch
    HBM. Multiple tiles per step amortize the per-grid-step fixed cost
    (DMA orchestration + Mosaic loop overhead) while keeping the 128-ray
    culling granularity,
  * triangles are Morton-sorted at scene build (scene.SceneBuilder.build)
    and grouped into fixed chunks of ``cluster`` rows; each chunk's AABB is
    slab-tested against the whole ray tile first, and `@pl.when` skips the
    chunk's Möller–Trumbore tile (cluster×RT VPU ops) when NO live ray
    enters the box closer than its current best — tile-granular divergence
    as a real scalar branch (the running best lives in VMEM scratch refs
    precisely so the culled block is side-effect-only: lax.cond over
    carried vectors lowers to select and would execute both branches),
  * a per-ray `alive` mask rides row 6 of the ray block: fully-dead tiles
    (wavefront tail after compaction sorting) skip the entire body,
  * spheres ride an unconditional chunk loop (scenes have few).

prim-id convention matches ops/intersect.py: spheres [0, SP), triangles
[SP, SP+TP); t=+inf encodes a miss. The winner's merged-table row
(intersect._pack_attrs layout) can be extracted in-kernel (want_attrs) by
one-hot masked sums over only the chunks that contain winners — replacing
the XLA winner-gather, whose per-element cost dwarfs the VPU math. The
rows are bit-identical to the oracle's gather; the differentiable
normal/UV/material recompute runs outside the kernel
(intersect.hit_attributes_from_rows), and gradients reach the scene
through intersect._winner_rows' scatter-add VJP, keeping the discrete
winner detached.

Layout notes (measured, both ways):
  * pair tiles are (prims=sublanes, rays=lanes): per-RAY values are (1, RT)
    rows = ONE vector register. The transposed orientation (rays on
    sublanes) makes every per-ray value a (RT, 1) column = 16 VREGs at
    1/128 lane utilization — 2× slower overall.
  * VMEM pads the last dim to 128 lanes, so the triangle planes are ONE
    (TP, 32) array (8 MB padded) carrying geometry + shading rather than
    two arrays (16 MB — OOM).

Tuning knobs ride a ``KConfig`` (resolved from RTT_* env vars per call by
the public wrappers; pass ``cfg`` explicitly for in-process sweeps —
tools/ab_kernel.py).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import Scene
from .intersect import merged_width

SPH_TT = 256      # spheres per chunk
BIG_ID = 2 ** 30  # plain int: jnp scalars would be captured as consts
TRI_DET_EPS = 1e-6  # matches wgsl:140


class KConfig(NamedTuple):
    """Static kernel-tuning knobs (hashable → usable as a jit static arg).

    rt:         rays per cull tile (lane axis; multiple of 128). The culling
                granularity: one slab prepass + one traversal per tile.
                Default 512 (solo r2 sweep, 1080p teapot trace ms/frame:
                rt128 99 · rt256 71 · rt512+st2 66 · rt1024 76 — wider
                tiles amortize per-tile fixed cost until the tile frustum
                gets too fat to cull).
    cluster:    triangles per cullable chunk (sublane axis); must divide the
                scene's triangle padding (a multiple of 128).
    tri_rows:   rows per Möller–Trumbore sub-block inside a cluster (must
                divide cluster). Bounds live-temporary footprint
                ≈ 30·(rows·rt/1024) vregs.
    step_tiles: cull tiles per grid step. >1 amortizes per-grid-step fixed
                cost (DMA + pipeline orchestration) over more rays without
                coarsening the culling tile. Default 2 (with rt=512; the
                solo sweep put rt512+st2 at 66 ms/frame vs 99 at
                rt128+st4 — the all-dead launch floor is 10.5 ms at
                rt128+st1).
    traversal:  cluster visit order —
                "span":      ascending sweep of the entering-cluster Morton
                             span, flag-gated per cluster,
                "centerout": spiral out from the nearest entering cluster,
                             re-slab-testing against the running best-t
                             (BVH-style early-out; extra scalar work),
                "nocull":    unconditional sweep of ALL clusters (ablation:
                             isolates scalar/predication overhead),
                "prepassonly": slab prepass but NO triangle tests (ablation:
                             measures everything-but-MT; results are wrong).
    """
    rt: int = 512
    cluster: int = 64
    tri_rows: int = 64
    step_tiles: int = 2
    traversal: str = "span"
    # Second hierarchy level in the RESIDENT kernel (VERDICT r2 #6):
    # ``supers`` clusters per super-cluster (multiple of 8; 0 = off). With
    # supers on, the per-tile prepass slab-tests the (few) super AABBs
    # first and only the ENTERING supers slab-test their member clusters —
    # replacing the all-clusters (C, RT) batch. Two wins: (a) prepass cost
    # drops ~supers-fold for coherent tiles, (b) it makes finer clusters
    # (cluster=32/64) affordable, which is what actually culls
    # geometrically for secondary/incoherent rays (bounce-2 tiles pass
    # 10.2 of 123 coarse clusters — see docs/PERF_NOTES.md culling table).
    # Span traversal only. DEFAULT FLIPPED r4 to supers=8 + cluster=64
    # after extraction chunking was decoupled from the cull cluster size
    # (esize=128 regardless of cl — the coupling is what made finer
    # clusters lose whole-frame in r3): whole-frame A/B measured
    # SUPERS=8,CLUSTER=64 at 103.8-105.3 ms/f vs 117.2-176.5 for the old
    # flat cl128 across two same-session sweeps (1080p teapot, 16-frame
    # scan harness).
    supers: int = 8
    # Streaming (tri-blocked) path: triangles ride a second grid dimension
    # in blocks of ``tri_block`` rows instead of keeping the whole scene
    # VMEM-resident — removes the ~30k-triangle VMEM cap. "auto" switches
    # when the packed planes exceed ``vmem_tri_budget`` bytes.
    tri_block: int = 8192            # 16384 stalls Mosaic compile (meas.)
    blocked: str = "auto"            # "auto" | "never" | "force"
    # ~12 MB keeps the teapot (15,744 padded tris = 8 MB of lane-padded
    # planes) on the resident fast path; anything bigger streams. With
    # vmem_limit raised past Mosaic's 16 MB default the resident kernel
    # can hold proportionally more (RTT_VMEM_BUDGET + RTT_VMEM_LIMIT
    # together move the resident/streaming crossover).
    vmem_tri_budget: int = 12 << 20
    # rays per grid step on the STREAMING path. Without block lists the
    # whole scene re-DMAs once per ray step, so big steps are essential
    # (512-ray steps moved ~400 GB/launch at 192k tris, measured 2.4
    # s/frame). WITH the per-step block lists (default) the tradeoff
    # inverts partway: a smaller step is a tighter frustum for the list,
    # so fewer blocks enter per step — r4 sweep at 192k tris with
    # median-split ordering: 2048 -> 178.2, 4096 -> 170.2-170.4,
    # 8192 -> 180.4-180.7 ms/f (bracketed); 16384 kills the Mosaic
    # compile. Tiles inside a step ride a dynamic fori_loop (not a
    # static unroll) to keep Mosaic compile time flat.
    blocked_step: int = 4096
    # Winner-row extraction flavor in the RESIDENT kernel: "sum" = one
    # masked sum per merged-table column (26|40 VPU reductions per winner
    # chunk); "mxu" = ONE one-hot contraction  planesᵀ(TW, csize) @
    # m(csize, RT)  per winner chunk at precision=HIGHEST (exact: one
    # nonzero per output sum), then 26|40 single-vreg row adds. Measured
    # r3 on v5e (ab_kernel, attrs path, primary rays): mxu 27.9 ms vs
    # sum 29.3 ms — mxu wins ~5%, default flipped per VERDICT r2 #2.
    extract: str = "mxu"
    # Möller–Trumbore engine in the RESIDENT kernel: "vpu" = elementwise
    # component math on (tri_rows, RT) tiles; "mxu" = the pair math as
    # THREE matmuls per cluster — the scalar triple products decompose as
    #   det   = -(n·d),            t_num = n·o - (a·n)
    #   u_num =  e2·(o×d) - (e2×a)·d
    #   v_num = -(e1·(o×d) - (e1×a)·d)
    # i.e. [n|e2×a|e1×a](3C,3) @ d(3,RT), n(C,3) @ o(3,RT), and
    # [e2|e1](2C,3) @ (o×d)(3,RT), all at precision=HIGHEST, with only the
    # divide/compare epilogue left on the VPU. ~6× fewer VPU cycles per
    # pair on paper — but measured r3 on v5e it LOSES ~2× at every shape
    # (ab_kernel: mxu 47.9 ms vs vpu 23.8 primary; 28.6 vs 14.4 bounce-1):
    # the K=3 f32 contraction leaves the systolic array ~2% utilized and
    # HIGHEST-precision passes triple the cost. Kept as an ablation knob;
    # default stays "vpu".
    mt: str = "vpu"
    # Per-step block lists (scalar-prefetch grid): an XLA-side conservative
    # slab test picks, for every ray step, WHICH triangle blocks any live
    # ray enters; the kernel's tri/cluster index maps then visit only those
    # (list padded by repeating the last entry — an unchanged index elides
    # the block re-DMA), so a dead (step, block) visit costs one scalar
    # compare instead of DMA + slab machinery.
    block_lists: bool = True
    # Mosaic scoped-VMEM budget for the STREAMING kernel, bytes (0 = the
    # compiler's 16 MB default). The r2-r4 "tri_block >= 12288 stalls
    # Mosaic" wall was actually a scoped-VMEM OOM (r5 diagnosis: AOT error
    # "16.65M of 16.00M limit" at tri_block=12288) — fat blocks need a
    # bigger budget, and v5e has 128 MB of VMEM per core. Raising the
    # limit trades pipelining headroom for capacity; measure per shape.
    vmem_limit: int = 0
    # Ray-STEP lists in the RESIDENT and any-hit kernels (r5): when the
    # caller passes a wavefront liveness mask, grid visits ride a scalar-
    # prefetch list of the steps containing ANY live lane; dead steps
    # (75-96% of the grid on bounce 1-3 wavefronts — liveness collapses
    # tile-coherently in the blocked pixel order) cost one scalar compare
    # instead of the 2.9 us/step ray-DMA + pipeline floor that made every
    # late-bounce launch cost ~5.8 ms regardless of liveness. Skipped
    # steps' outputs are masked to the dead-lane values XLA-side (the
    # wheres fuse into the consumers). RTT_STEP_LISTS=0 disables.
    step_lists: bool = True


def env_config() -> KConfig:
    """KConfig from RTT_* env vars (read per call, so tests/sweeps can
    change them without reimporting).

    Fallbacks come from KConfig's own field defaults — the measured-best
    production configuration has exactly ONE source of truth (VERDICT r3
    'extract-default split': env_config's hardcoded "sum" silently
    overrode the tuned KConfig.extract="mxu" on every production call).
    Pinned by tests/test_pallas.py::test_env_config_matches_defaults.
    """
    d = KConfig()
    return KConfig(
        rt=int(os.environ.get("RTT_RT", d.rt)),
        cluster=int(os.environ.get("RTT_CLUSTER", d.cluster)),
        tri_rows=int(os.environ.get("RTT_TRI_ROWS", d.tri_rows)),
        step_tiles=int(os.environ.get("RTT_STEP_TILES", d.step_tiles)),
        traversal=os.environ.get("RTT_TRAVERSAL", d.traversal),
        supers=int(os.environ.get("RTT_SUPERS", d.supers)),
        mt=os.environ.get("RTT_MT", d.mt),
        tri_block=int(os.environ.get("RTT_TRI_BLOCK", d.tri_block)),
        blocked=os.environ.get("RTT_BLOCKED", d.blocked),
        blocked_step=int(os.environ.get("RTT_BLOCKED_STEP", d.blocked_step)),
        extract=os.environ.get("RTT_EXTRACT", d.extract),
        block_lists=os.environ.get("RTT_BLOCK_LISTS", "1") != "0",
        vmem_limit=int(os.environ.get("RTT_VMEM_LIMIT", d.vmem_limit)),
        vmem_tri_budget=int(os.environ.get("RTT_VMEM_BUDGET",
                                           d.vmem_tri_budget)),
        step_lists=os.environ.get("RTT_STEP_LISTS", "1") != "0",
    )


def _fit_cluster(cfg: KConfig, TP: int) -> KConfig:
    """Clamp cfg.cluster to a divisor of the scene's triangle padding:
    the largest power-of-two divisor of TP in [8, 128] (Mosaic sublane
    dims must be multiples of 8). Covers scenes built with a small
    explicit pad; production scenes pad to multiples of 128 and keep the
    configured cluster."""
    if TP % cfg.cluster == 0:
        return cfg
    c = 128
    while c > 8 and TP % c != 0:
        c //= 2
    return cfg._replace(cluster=c)


def _pack_tris(scene: Scene, textured: bool = False, mxu: bool = False):
    """(TP, 32|48 [+8]) plane array:
    [a(3) | e1(3) | e2(3) | n(3) | n0(3) | n1(3) | n2(3) | albedo(3) |
     emission(3) | es | smooth | pad(3)] — Möller–Trumbore geometry plus the
    shading attributes the extraction pass reads. ONE array because VMEM
    pads the lane (last) dimension to 128: two arrays would double the 8 MB
    padded footprint and overflow the ~16 MB VMEM budget (measured).

    ``textured`` appends [uv0(2) | uv1(2) | uv2(2) | tan(3) | bitan(3) |
    tex | ntex | pad(2)] at cols 32-47 so the fused extraction can emit
    interpolated UVs + texture ids in-kernel (the 128-lane VMEM padding
    means the wider plane array costs no extra VMEM).

    ``mxu`` (KConfig.mt == "mxu") appends [e2×a(3) | e1×a(3) | a·n | pad]
    after the base/textured block — the per-triangle constants that turn
    the Möller–Trumbore triple products into matmuls (see KConfig.mt).
    Kernel-side column offset = 48 if textured else 32.

    n = e1 × e2 is the unnormalized geometric normal; ray-independent, so
    XLA hoists the packing out of the per-frame loop.
    """
    a = scene.tri_v0
    e1 = scene.tri_v1 - scene.tri_v0
    e2 = scene.tri_v2 - scene.tri_v0
    n = jnp.cross(e1, e2)
    pad = jnp.zeros((a.shape[0], 3), jnp.float32)
    cols = [
        a, e1, e2, n,
        scene.tri_n0, scene.tri_n1, scene.tri_n2,
        scene.tri_albedo, scene.tri_emission,
        scene.tri_emission_strength[:, None],
        scene.tri_smoothness[:, None], pad,
    ]
    if textured:
        cols += [
            scene.tri_uv0, scene.tri_uv1, scene.tri_uv2,
            scene.tri_tan, scene.tri_bitan,
            scene.tri_tex[:, None].astype(jnp.float32),
            scene.tri_ntex[:, None].astype(jnp.float32),
            jnp.zeros((a.shape[0], 2), jnp.float32),
        ]
    if mxu:
        cols += [
            jnp.cross(e2, a), jnp.cross(e1, a),
            jnp.sum(a * n, axis=-1, keepdims=True),
            jnp.zeros((a.shape[0], 1), jnp.float32),
        ]
    return jnp.concatenate(cols, axis=1)


def _pack_spheres(scene: Scene):
    """(SP, 16) plane array:
    [c(3) | r^2 | valid | albedo(3) | emission(3) | es | smooth | pad(3)]."""
    pad = jnp.zeros((scene.sphere_center.shape[0], 3), jnp.float32)
    return jnp.concatenate([
        scene.sphere_center,
        (scene.sphere_radius ** 2)[:, None],
        scene.sphere_valid[:, None],
        scene.sphere_albedo,
        scene.sphere_emission,
        scene.sphere_emission_strength[:, None],
        scene.sphere_smoothness[:, None],
        pad,
    ], axis=1)


def _attr_copy_maps(textured: bool):
    """(acc row, plane col) copy maps for the raw-row winner extraction.

    The acc rows ARE the merged-table columns of intersect._pack_attrs
    (spheres: [c|r²|albedo|emission|es|smooth]; triangles:
    [v0|e1|e2|n0..n2|albedo|emission|es|smooth(+uv/tan/tex)]); the plane
    cols follow _pack_spheres/_pack_tris, which carry extra derived columns
    the merged table omits (sphere `valid` at col 4, the geometric normal
    at tri cols 9:12)."""
    sph = list(zip(range(12), (0, 1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12)))
    tri = ([(r, r) for r in range(9)]
           + [(r, r + 3) for r in range(9, 26)])
    if textured:
        tri += [(r, r + 6) for r in range(26, 38)] + [(38, 44), (39, 45)]
    return sph, tri


def _attr_rows(textured: bool) -> int:
    """Kernel attr-output rows: the merged-table width rounded up to the
    f32 sublane tile (8). Rows past the table width are zero padding."""
    return -(-merged_width(textured) // 8) * 8


def _cluster_aabbs(scene: Scene, csize: int):
    """(C, 8) cluster bounds [lo(3) | hi(3) | pad(2)] over Morton-sorted
    triangle chunks. Invalid (padding) triangles contribute ±inf.

    NOTE: an all-padding cluster's (lo=+inf, hi=-inf) box does NOT fail
    the slab test — per axis {t1,t2} = {±inf}, so tn folds to t_min and
    tf to +inf and every live ray "enters". The kernels therefore mask
    entry flags with the static real-cluster count (valid triangles come
    first: the Morton sort runs before padding is appended in
    SceneBuilder.build)."""
    TP = scene.padded_tris
    C = TP // csize
    valid = (scene.tri_valid > 0.5)[:, None, None]             # (TP,1,1)
    vs = jnp.stack([scene.tri_v0, scene.tri_v1, scene.tri_v2], 1)  # (TP,3,3)
    lo = jnp.where(valid, vs, jnp.inf).reshape(C, csize * 3, 3).min(1)
    hi = jnp.where(valid, vs, -jnp.inf).reshape(C, csize * 3, 3).max(1)
    return jnp.concatenate([lo, hi, jnp.zeros((C, 2), jnp.float32)], axis=1)


def _validate_cfg(cfg: KConfig) -> None:
    """Knob validation shared by ALL kernel call wrappers — a typo'd
    RTT_MT/RTT_EXTRACT/RTT_TRAVERSAL must raise everywhere, not silently
    fall through to the default engine on one path."""
    if cfg.extract not in ("sum", "mxu"):
        raise ValueError(f"KConfig.extract must be 'sum' or 'mxu', got "
                         f"{cfg.extract!r}")
    if cfg.traversal not in ("span", "centerout", "nocull", "prepassonly"):
        raise ValueError(f"unknown KConfig.traversal {cfg.traversal!r}")
    if cfg.mt not in ("vpu", "mxu"):
        raise ValueError(f"KConfig.mt must be 'vpu' or 'mxu', got "
                         f"{cfg.mt!r}")
    if cfg.supers:
        if cfg.supers % 8:
            raise ValueError(f"KConfig.supers must be a multiple of 8 "
                             f"(sublane tiling), got {cfg.supers}")
        if cfg.traversal != "span":
            raise ValueError("KConfig.supers requires traversal='span', "
                             f"got {cfg.traversal!r}")


def _pad_clusters_for_supers(clu, ss: int):
    """Shared host-side supers setup: pad the cluster rows to whole supers
    (±inf boxes — masked in the kernels by the real-cluster count) and
    build the super AABBs. Returns (clu, sup)."""
    n_super = -(-clu.shape[0] // ss)
    scp = -(-n_super // 8) * 8
    pad_rows = n_super * ss - clu.shape[0]
    if pad_rows:
        pad = jnp.concatenate(
            [jnp.full((pad_rows, 3), jnp.inf, jnp.float32),
             jnp.full((pad_rows, 3), -jnp.inf, jnp.float32),
             jnp.zeros((pad_rows, 2), jnp.float32)], axis=1)
        clu = jnp.concatenate([clu, pad], axis=0)
    return clu, _super_aabbs(clu, ss, scp)


def _mt_mxu_pairs(tri_ref, sl, mo, dmat, omat, oxd, t_min):
    """Möller–Trumbore for one cluster as MXU contractions — ONE
    definition shared by the resident, streaming and any-hit kernels
    (same rule as _mt_pairs/_slab_test: the math can never diverge
    between them). See KConfig.mt for the triple-product derivation.

    Args: tri_ref plane ref; sl cluster row slice; mo mxu-prep column
    offset (32, or 48 on the textured layout); dmat/omat/oxd the (3, RT)
    per-tile ray matrices (hoisted by the caller — they are
    cluster-invariant). Returns (t, geom_valid) shaped (csize, RT);
    the caller adds its own liveness/t_max masks and fold/any-hit tail.
    """
    # NOTE: the factors are contracted SEPARATELY (six (c,3)@(3,RT) dots)
    # rather than row-stacked into [n|e2×a|e1×a](3c,3) @ dmat — stacking
    # needs an in-kernel concatenate of plane slices living at different
    # lane offsets (cols 9, mo, mo+3), which Mosaic rejects ("result/input
    # offset mismatch on non-concat dimension", measured on v5e). Same
    # MXU work either way: the contraction dim is K=3 in both shapes.
    n_cols = tri_ref[sl, 9:12]
    e2xa = tri_ref[sl, mo:mo + 3]
    e1xa = tri_ref[sl, mo + 3:mo + 6]
    e2 = tri_ref[sl, 6:9]
    e1 = tri_ref[sl, 3:6]
    an = tri_ref[sl, mo + 6:mo + 7]

    def dg(a_m, b_m):
        return jax.lax.dot_general(
            a_m, b_m, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    det = -dg(n_cols, dmat)                         # (c, RT)
    inv = 1.0 / det
    t = (dg(n_cols, omat) - an) * inv
    u = (dg(e2, oxd) - dg(e2xa, dmat)) * inv
    v = -(dg(e1, oxd) - dg(e1xa, dmat)) * inv
    valid = ((det >= TRI_DET_EPS) & (t >= t_min) & (u >= 0.0)
             & (v >= 0.0) & (u + v <= 1.0))
    return t, valid


def _ray_mats(ray_ref, lanes):
    """(omat, dmat, oxd): the (3, RT) ray matrices the MXU MT engine
    contracts against — tile-invariant, so callers hoist ONE evaluation
    per tile (not per cluster).

    Reads CONTIGUOUS (3, RT) ref slices (rows 0-2 = origin, 3-5 =
    direction in every kernel's ray layout) instead of concatenating
    per-component (1, RT) slices: Mosaic rejects tpu.concatenate of
    operands at mismatched sublane/lane offsets (see _mt_mxu_pairs).
    The oxd concat is safe — its inputs are freshly computed values at
    offset zero, not ref slices."""
    omat = ray_ref[0:3, lanes]
    dmat = ray_ref[3:6, lanes]
    o1, o2, o3 = omat[0:1], omat[1:2], omat[2:3]
    d1, d2, d3 = dmat[0:1], dmat[1:2], dmat[2:3]
    oxd = jnp.concatenate(
        [o2 * d3 - o3 * d2, o3 * d1 - o1 * d3, o1 * d2 - o2 * d1], axis=0)
    return omat, dmat, oxd


def _super_aabbs(clu, ss: int, scp: int):
    """(scp, 8) super-cluster AABBs over groups of ``ss`` cluster rows of
    ``clu`` (whose row count must be a multiple of ss; all-padding cluster
    rows carry lo=+inf / hi=-inf and drop out of the min/max). Rows past
    the real super count are ±inf (vacuously-entering boxes — the kernel
    masks them by the static real-super count, same convention as
    _cluster_aabbs)."""
    n_super = clu.shape[0] // ss
    lo = clu[:, 0:3].reshape(n_super, ss, 3).min(1)
    hi = clu[:, 3:6].reshape(n_super, ss, 3).max(1)
    pad = scp - n_super
    lo = jnp.pad(lo, ((0, pad), (0, 0)), constant_values=jnp.inf)
    hi = jnp.pad(hi, ((0, pad), (0, 0)), constant_values=-jnp.inf)
    return jnp.concatenate([lo, hi, jnp.zeros((scp, 2), jnp.float32)], axis=1)


def _slab_test(lo, hi, o, invd, t_min):
    """AABB slab test. ``lo``/``hi``/``o``/``invd`` are (x, y, z) triples
    of broadcast-compatible arrays; returns (tn, tf) with the reference
    near-clamp at t_min. Shared by every kernel's prepass so the test can
    never diverge between them."""
    t1x, t2x = (lo[0] - o[0]) * invd[0], (hi[0] - o[0]) * invd[0]
    t1y, t2y = (lo[1] - o[1]) * invd[1], (hi[1] - o[1]) * invd[1]
    t1z, t2z = (lo[2] - o[2]) * invd[2], (hi[2] - o[2]) * invd[2]
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                 jnp.minimum(t1y, t2y)),
                     jnp.maximum(jnp.minimum(t1z, t2z), t_min))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                 jnp.maximum(t1y, t2y)),
                     jnp.maximum(t1z, t2z))
    return tn, tf


def _mt_pairs(a, e1, e2, n, o, d, t_min):
    """Möller–Trumbore cross/determinant form (wgsl:125-147) on loaded
    plane rows. ``a``/``e1``/``e2``/``n`` and ``o``/``d`` are (x, y, z)
    triples; returns (t, geom_valid). One definition shared by the
    resident, streaming and any-hit kernels."""
    aox, aoy, aoz = o[0] - a[0], o[1] - a[1], o[2] - a[2]
    det = -(d[0] * n[0] + d[1] * n[1] + d[2] * n[2])
    t_num = aox * n[0] + aoy * n[1] + aoz * n[2]
    daox = aoy * d[2] - aoz * d[1]                      # ao × d
    daoy = aoz * d[0] - aox * d[2]
    daoz = aox * d[1] - aoy * d[0]
    u_num = e2[0] * daox + e2[1] * daoy + e2[2] * daoz
    v_num = -(e1[0] * daox + e1[1] * daoy + e1[2] * daoz)
    inv = 1.0 / det
    t = t_num * inv
    u = u_num * inv
    v = v_num * inv
    valid = ((det >= TRI_DET_EPS) & (t >= t_min)
             & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))
    return t, valid


def _sphere_pairs(c, r2, o, d, a_quad, t_min):
    """Near-root sphere quadratic (wgsl:106-123). ``c``/``o``/``d`` are
    (x, y, z) triples; returns (t, geom_valid)."""
    ocx, ocy, ocz = o[0] - c[0], o[1] - c[1], o[2] - c[2]
    b = 2.0 * (ocx * d[0] + ocy * d[1] + ocz * d[2])
    cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
    disc = b * b - 4.0 * a_quad * cc
    t = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a_quad)
    return t, (disc >= 0.0) & (t >= t_min)


def _min_fold_refs(t_pairs, valid, ids, bt_ref, bi_ref, lanes=slice(None)):
    """Fold an (tt, RT) candidate tile into the running best held in VMEM
    scratch refs (row 0). Refs (not loop-carried values) so that culled
    blocks can be @pl.when-predicated — lax.cond over carried vectors gets
    lowered to select (both branches execute), which defeats culling.
    ``lanes`` selects the scratch lane window (the streaming kernel's
    per-tile slice of its launch-persistent best)."""
    t_m = jnp.where(valid, t_pairs, jnp.inf)
    cmin = jnp.min(t_m, axis=0, keepdims=True)                  # (1, RT)
    cid = jnp.min(jnp.where(t_m == cmin, ids, BIG_ID), axis=0,
                  keepdims=True)
    best_t = bt_ref[0:1, lanes]
    better = cmin < best_t
    bt_ref[0:1, lanes] = jnp.where(better, cmin, best_t)
    bi_ref[0:1, lanes] = jnp.where(better, cid, bi_ref[0:1, lanes])


def _make_kernel(SP: int, TP: int, t_min: float, tt_s: int,
                 want_attrs: bool, cfg: KConfig, textured: bool = False,
                 n_real_clu: int | None = None, has_spheres: bool = True,
                 use_slists: bool = False):
    _validate_cfg(cfg)
    n_sph_chunks = SP // tt_s
    RT, csize = cfg.rt, cfg.cluster
    tri_sub = min(cfg.tri_rows, csize)
    ss = cfg.supers
    AR = _attr_rows(textured)        # attr rows (see nearest_hit_attrs_pallas)
    sph_map, tri_map = _attr_copy_maps(textured)
    if n_real_clu is None:
        n_real_clu = TP // csize
    n_real_super = -(-n_real_clu // ss) if ss else 0
    # static elision: a scene with no real spheres (every mesh workload —
    # sphere arrays are pure padding) skips the quadratic fold + sphere
    # extraction entirely; likewise sphere-only scenes skip the triangle
    # prepass/traversal (n_real_clu == 0)
    has_tris = n_real_clu > 0

    def kernel(*refs):
        # with use_slists (ray-step lists, r5) the grid rides a scalar-
        # prefetch list of LIVE ray steps: visit i processes step sl[i],
        # visits past cnt repeat the last live step (no re-DMA) and are
        # fully gated off — outputs of skipped steps are masked to the
        # dead-lane values (inf/0/zeros) XLA-side by the caller
        if use_slists:
            sl_ref, cnt_ref, *refs = refs
        ray_ref, sph_ref, tri_ref, clu_ref, *outs_and_scratch = refs
        sup_ref = sup_flag_ref = acc_ref = None
        rest = list(outs_and_scratch)
        if ss:
            sup_ref, rest = rest[0], rest[1:]       # inputs precede outputs
        if ss:
            sup_flag_ref, rest = rest[-1], rest[:-1]  # scratch comes last
        if want_attrs:
            (t_out, id_out, attr_out, bt_ref, bi_ref, flag_ref,
             acc_ref) = rest
        else:
            t_out, id_out, bt_ref, bi_ref, flag_ref = rest

        def one_tile(L):
            """Full traversal for the cull tile at lane offset L (traced:
            tiles ride a dynamic fori_loop — a static unroll multiplies
            host-side trace/lowering time by step_tiles, measured 40 s →
            200+ s at step_tiles=4)."""
            lanes = pl.ds(pl.multiple_of(L, RT), RT)
            # Whole-tile liveness gate (r4): a fully dead tile (sparse
            # deep-bounce wavefronts) previously still paid the ray loads
            # + reciprocals + their serial VMEM latency — the dominant
            # share of the 5.8 ms all-dead launch floor. Scratch inits and
            # output writes stay unconditional (dead tiles must emit
            # inf/BIG_ID/zero attrs).
            alive_any = jnp.any(ray_ref[6:7, lanes] > 0.5)
            bt_ref[0:1, :] = jnp.full((1, RT), jnp.inf, jnp.float32)
            bi_ref[0:1, :] = jnp.full((1, RT), BIG_ID, jnp.int32)
            if want_attrs:
                acc_ref[:, :] = jnp.zeros((AR, RT), jnp.float32)

            @pl.when(alive_any)
            def _run_tile():
                # ray_ref: (8, step_tiles*RT) rows [ox oy oz dx dy dz alive ·]
                ox, oy, oz = (ray_ref[0:1, lanes], ray_ref[1:2, lanes],
                              ray_ref[2:3, lanes])
                dx, dy, dz = (ray_ref[3:4, lanes], ray_ref[4:5, lanes],
                              ray_ref[5:6, lanes])
                alive = ray_ref[6:7, lanes] > 0.5
                a_quad = dx * dx + dy * dy + dz * dz      # (1, RT), |d|^2
                # slab-test reciprocals; IEEE inf is fine except 0*inf at lo==o,
                # so substitute a huge finite value for axis-parallel rays
                invdx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
                invdy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
                invdz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)


                def sphere_chunk(k, carry):
                    s = k * tt_s
                    sl = pl.ds(s, tt_s)
                    t, ok = _sphere_pairs(
                        (sph_ref[sl, 0:1], sph_ref[sl, 1:2], sph_ref[sl, 2:3]),
                        sph_ref[sl, 3:4], (ox, oy, oz), (dx, dy, dz),
                        a_quad, t_min)
                    valid = ok & (sph_ref[sl, 4:5] > 0.5) & alive
                    ids = (jax.lax.broadcasted_iota(jnp.int32, (tt_s, RT), 0)
                           + jnp.int32(s))
                    _min_fold_refs(t, valid, ids, bt_ref, bi_ref)
                    return carry

                def tri_rows(s, rows):
                    """Möller–Trumbore on ``rows`` triangles starting at row s."""
                    sl = pl.ds(s, rows)
                    t, ok = _mt_pairs(
                        (tri_ref[sl, 0:1], tri_ref[sl, 1:2], tri_ref[sl, 2:3]),
                        (tri_ref[sl, 3:4], tri_ref[sl, 4:5], tri_ref[sl, 5:6]),
                        (tri_ref[sl, 6:7], tri_ref[sl, 7:8], tri_ref[sl, 8:9]),
                        (tri_ref[sl, 9:10], tri_ref[sl, 10:11],
                         tri_ref[sl, 11:12]),
                        (ox, oy, oz), (dx, dy, dz), t_min)
                    valid = ok & alive
                    ids = (jax.lax.broadcasted_iota(jnp.int32, (rows, RT), 0)
                           + (jnp.int32(SP) + s))
                    _min_fold_refs(t, valid, ids, bt_ref, bi_ref)

                if cfg.mt == "mxu":
                    # cluster-invariant (3, RT) ray matrices — ONE evaluation
                    # per tile, not per visited cluster
                    omat, dmat, oxd = _ray_mats(ray_ref, lanes)

                def mt_cluster_mxu(s):
                    """Möller–Trumbore for a whole cluster as three MXU
                    contractions (shared _mt_mxu_pairs; only the fold tail
                    differs per kernel)."""
                    mo = 48 if textured else 32      # mxu-prep column offset
                    sl = pl.ds(s, csize)
                    t, ok = _mt_mxu_pairs(tri_ref, sl, mo, dmat, omat, oxd,
                                          t_min)
                    ids = (jax.lax.broadcasted_iota(jnp.int32, (csize, RT), 0)
                           + (jnp.int32(SP) + s))
                    _min_fold_refs(t, ok & alive, ids, bt_ref, bi_ref)

                def tri_block(s):
                    """MT on a whole cluster, in tri_rows-row sub-blocks: a
                    (csize,RT) op is csize·RT/1024 vregs and MT keeps ~25-30
                    temporaries live, far beyond the VPU register file — smaller
                    sub-blocks keep live ranges register-resident (spill
                    suspect 2.5 in docs/PERF_NOTES.md). Static Python loop →
                    fully unrolled, no scalar-loop overhead. The "mxu" engine
                    instead rides the cluster through the systolic array in one
                    shot (KConfig.mt)."""
                    if cfg.mt == "mxu":
                        mt_cluster_mxu(s)
                        return
                    for r0 in range(0, csize, tri_sub):
                        tri_rows(s + r0, tri_sub)

                def cluster_prepass():
                    """Vectorized slab test of ALL cluster AABBs at once → per-
                    cluster enter flags, the span [first, last] of entering
                    clusters, and the NEAREST entering cluster c0.

                    One (C, RT) batch — no per-cluster scalar loads or branches,
                    which otherwise cost as much as the culled triangle math.
                    The span relies on Morton order making entering clusters (a
                    compact tile frustum × a space-filling curve) contiguous.
                    """
                    C = clu_ref.shape[0]
                    tn, tf = _slab_test(
                        (clu_ref[:, 0:1], clu_ref[:, 1:2], clu_ref[:, 2:3]),
                        (clu_ref[:, 3:4], clu_ref[:, 4:5], clu_ref[:, 5:6]),
                        (ox, oy, oz), (invdx, invdy, invdz), t_min)  # (C, RT)
                    # initial tightening: spheres already folded into best_t;
                    # all-padding clusters pass the slab test vacuously (see
                    # _cluster_aabbs) — mask them by the real-cluster count
                    cidx = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                    enter = ((tf >= tn) & alive & (tn < bt_ref[0:1, :])
                             & (cidx < jnp.int32(n_real_clu)))
                    flag = jnp.max(jnp.where(enter, 1, 0), axis=1, keepdims=True)
                    flag_ref[:, :] = jnp.broadcast_to(flag, flag_ref.shape)
                    first = jnp.min(jnp.where(flag > 0, cidx, C))
                    last = jnp.max(jnp.where(flag > 0, cidx, -1))
                    # nearest entering cluster = argmin of the tile-min entry
                    # distance; the traversal spirals outward from it
                    tn_tile = jnp.min(jnp.where(enter, tn, jnp.inf), axis=1,
                                      keepdims=True)                 # (C, 1)
                    c0 = jnp.min(jnp.where(tn_tile <= jnp.min(tn_tile), cidx, C))
                    return first, last, jnp.minimum(c0, last)

                def make_order_body(first, last, c0):
                    def order_body(k, carry):
                        # center-out visit order c0, c0+1, c0-1, c0+2, … — a
                        # near-to-far proxy (Morton neighbors are spatial
                        # neighbors), so early hits tighten best_t before far
                        # clusters are re-tested, and the re-test culls them:
                        # BVH-style early-out on a flat cluster array
                        off = (k + 1) // 2
                        c = c0 + jnp.where(k % 2 == 1, off, -off)

                        @pl.when((c >= first) & (c <= last)
                                 & (flag_ref[c, 0] > 0))
                        def _():
                            # re-test this cluster against the CURRENT best
                            # before paying for its csize×RT MT tile
                            tn, tf = _slab_test(
                                (clu_ref[c, 0], clu_ref[c, 1], clu_ref[c, 2]),
                                (clu_ref[c, 3], clu_ref[c, 4], clu_ref[c, 5]),
                                (ox, oy, oz), (invdx, invdy, invdz), t_min)
                            enter = (tf >= tn) & alive & (tn < bt_ref[0:1, :])

                            @pl.when(jnp.any(enter))
                            def _():
                                tri_block(c * csize)
                        return carry
                    return order_body

                def span_body(c, carry):
                    # per-cluster flag read (one scalar) skips Morton-span slack
                    @pl.when(flag_ref[c, 0] > 0)
                    def _():
                        tri_block(c * csize)
                    return carry

                def super_prepass():
                    """Stage 1 of the two-level prepass (KConfig.supers): slab
                    the few super AABBs at once → per-super flags + span. The
                    member-cluster slabs run lazily inside super_body, only
                    for entering supers."""
                    SCr = sup_ref.shape[0]
                    tn, tf = _slab_test(
                        (sup_ref[:, 0:1], sup_ref[:, 1:2], sup_ref[:, 2:3]),
                        (sup_ref[:, 3:4], sup_ref[:, 4:5], sup_ref[:, 5:6]),
                        (ox, oy, oz), (invdx, invdy, invdz), t_min)  # (SCr, RT)
                    sidx = jax.lax.broadcasted_iota(jnp.int32, (SCr, 1), 0)
                    enter = ((tf >= tn) & alive & (tn < bt_ref[0:1, :])
                             & (sidx < jnp.int32(n_real_super)))
                    sflag = jnp.max(jnp.where(enter, 1, 0), axis=1,
                                    keepdims=True)
                    sup_flag_ref[:, :] = jnp.broadcast_to(sflag,
                                                          sup_flag_ref.shape)
                    sfirst = jnp.min(jnp.where(sflag > 0, sidx, SCr))
                    slast = jnp.max(jnp.where(sflag > 0, sidx, -1))
                    return sfirst, slast

                def super_body(s_id, carry):
                    @pl.when(sup_flag_ref[s_id, 0] > 0)
                    def _():
                        base = s_id * ss
                        sl = pl.ds(pl.multiple_of(base, ss), ss)
                        # stage 2: slab only this super's member clusters,
                        # tightened by the best-t reached so far (earlier
                        # supers' hits cull later ones — BVH-style early-out)
                        tn, tf = _slab_test(
                            (clu_ref[sl, 0:1], clu_ref[sl, 1:2],
                             clu_ref[sl, 2:3]),
                            (clu_ref[sl, 3:4], clu_ref[sl, 4:5],
                             clu_ref[sl, 5:6]),
                            (ox, oy, oz), (invdx, invdy, invdz), t_min)
                        cidx = (jax.lax.broadcasted_iota(jnp.int32, (ss, 1), 0)
                                + base)
                        enter = ((tf >= tn) & alive & (tn < bt_ref[0:1, :])
                                 & (cidx < jnp.int32(n_real_clu)))
                        cflag = jnp.max(jnp.where(enter, 1, 0), axis=1,
                                        keepdims=True)
                        flag_ref[sl, :] = jnp.broadcast_to(
                            cflag, (ss, flag_ref.shape[1]))
                        for off in range(ss):
                            @pl.when(flag_ref[base + off, 0] > 0)
                            def _(off=off):
                                tri_block((base + off) * csize)
                    return carry

                def nocull_body(c, carry):
                    tri_block(c * csize)
                    return carry

                @pl.when(jnp.any(alive))
                def _():
                    # fully-dead tiles (compacted wavefront tail) skip everything
                    if has_spheres:
                        jax.lax.fori_loop(0, n_sph_chunks, sphere_chunk, 0)
                    if not has_tris:
                        return
                    if cfg.traversal == "nocull":
                        jax.lax.fori_loop(0, TP // csize, nocull_body, 0)
                        return
                    if ss:
                        sfirst, slast = super_prepass()
                        jax.lax.fori_loop(sfirst, slast + 1, super_body, 0)
                        return
                    first, last, c0 = cluster_prepass()
                    if cfg.traversal == "centerout":
                        n_steps = 2 * jnp.maximum(last - c0, c0 - first) + 1
                        jax.lax.fori_loop(0, n_steps,
                                          make_order_body(first, last, c0), 0)
                    elif cfg.traversal == "prepassonly":
                        pass    # ablation: no MT at all (results are wrong)
                    else:  # "span": ascending flag-gated sweep, no re-test
                        jax.lax.fori_loop(first, last + 1, span_body, 0)

                if want_attrs:
                    # ---- winner raw-row extraction (one-hot masked sums) -----
                    # Emits the winner's merged-table row (intersect._pack_attrs
                    # layout) VERBATIM from the plane columns — no in-kernel
                    # recompute; the differentiable normal/UV/material math runs
                    # outside (intersect.hit_attributes_from_rows), bit-identical
                    # to the oracle because the rows are. Replaces the XLA
                    # winner-gather (per-element gather cost on TPU dwarfs the
                    # VPU math). Only chunks containing a winning id run;
                    # coherent tiles touch few.
                    best_id_v = bi_ref[0:1, :]

                    def sph_extract(k, carry):
                        sbase = k * tt_s
                        ids = (jax.lax.broadcasted_iota(
                            jnp.int32, (tt_s, RT), 0) + jnp.int32(sbase))
                        ok = ids == best_id_v                        # (tt, RT)
                        for row, col in sph_map:
                            acc_ref[row:row + 1, :] += jnp.sum(
                                jnp.where(ok, sph_ref[pl.ds(sbase, tt_s),
                                                      col:col + 1], 0.0),
                                0, keepdims=True)
                        return carry

                    # extraction chunk size is DECOUPLED from the cull cluster
                    # size: finer culling clusters (cl32/cl64) would otherwise
                    # shrink the one-hot contraction's K dim and multiply chunk
                    # sweeps — the reason r3's sup16+cl32 lost whole-frame
                    # despite winning intersect-only
                    esize = 128 if TP % 128 == 0 else csize

                    def tri_extract(c, carry):
                        lo_id = jnp.int32(SP) + c * esize
                        in_chunk = ((best_id_v >= lo_id)
                                    & (best_id_v < lo_id + esize))

                        @pl.when(jnp.any(in_chunk))
                        def _():
                            sl = pl.ds(c * esize, esize)
                            ids = (jax.lax.broadcasted_iota(
                                jnp.int32, (esize, RT), 0) + lo_id)
                            ok = ids == best_id_v
                            if cfg.extract == "mxu":
                                # one one-hot contraction replaces the per-
                                # column masked sums (see KConfig.extract);
                                # slice to the merged-table width — the
                                # mxu-prep tail columns (cfg.mt) are never
                                # read from rows_all
                                ew = 48 if textured else 32
                                rows_all = jax.lax.dot_general(
                                    tri_ref[sl, 0:ew], ok.astype(jnp.float32),
                                    (((0,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
                                for row, col in tri_map:
                                    acc_ref[row:row + 1, :] += \
                                        rows_all[col:col + 1, :]
                            else:
                                for row, col in tri_map:
                                    acc_ref[row:row + 1, :] += jnp.sum(
                                        jnp.where(ok, tri_ref[sl, col:col + 1],
                                                  0.0),
                                        0, keepdims=True)
                        return carry

                    @pl.when(jnp.any(alive))
                    def _():
                        if has_spheres:
                            jax.lax.fori_loop(0, n_sph_chunks, sph_extract, 0)
                        if has_tris:
                            # restrict the chunk sweep to the winners' id range
                            is_tw = (best_id_v >= SP) & (best_id_v < SP + TP)
                            c_lo = (jnp.min(jnp.where(is_tw, best_id_v,
                                                      SP + TP)) - SP) // esize
                            c_hi = (jnp.max(jnp.where(is_tw, best_id_v, SP))
                                    - SP) // esize
                            jax.lax.fori_loop(c_lo, c_hi + 1, tri_extract, 0)


            if want_attrs:
                attr_out[:, lanes] = acc_ref[:, :]

            # output blocks are (8, ·) — sublane dim must be ≥8 on TPU — so
            # broadcast the (1, RT) result across the rows; caller reads
            # row 0.
            best_t, best_id = bt_ref[0:1, :], bi_ref[0:1, :]
            t_out[:, lanes] = jnp.broadcast_to(best_t, (8, RT))
            id_out[:, lanes] = jnp.broadcast_to(
                jnp.where(best_id == BIG_ID, jnp.int32(0), best_id),
                (8, RT))

        def run_tiles():
            if cfg.step_tiles <= 2:
                # static unroll: constant lane offsets lower to static
                # slices (cheaper scalar addressing, cross-tile
                # pipelining); bounded at 2 because trace/lowering time
                # scales with the unroll (measured 40 s -> 200+ s at
                # step_tiles=4)
                for _j in range(cfg.step_tiles):
                    one_tile(_j * RT)
            else:
                def tile_body(j, carry):
                    one_tile(j * RT)
                    return carry

                jax.lax.fori_loop(0, cfg.step_tiles, tile_body, 0)

        if use_slists:
            @pl.when(pl.program_id(0) < cnt_ref[0])
            def _():
                run_tiles()
        else:
            run_tiles()

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "want_attrs",
                                             "interpret", "cfg"))
def _nearest_hit_call(scene: Scene, o, d, t_min, alive, want_attrs,
                      interpret, cfg: KConfig):
    R = o.shape[0]
    SP, TP = scene.padded_spheres, scene.padded_tris
    tt_s = min(SPH_TT, SP)
    _validate_cfg(cfg)
    cfg = _fit_cluster(cfg, TP)
    csize, RT = cfg.cluster, cfg.rt

    step = RT * cfg.step_tiles
    n_steps = -(-R // step)
    Rp = n_steps * step
    if alive is None:
        alive_f = jnp.ones((R,), jnp.float32)
    else:
        alive_f = alive.astype(jnp.float32)
    rays = jnp.concatenate([o, d, alive_f[:, None]], axis=1).T   # (7, R)
    rays = jnp.pad(rays, ((0, 1), (0, Rp - R)))                  # (8, Rp)

    textured = want_attrs and scene.num_textures > 0
    sph = _pack_spheres(scene)                                   # (SP, 16)
    tri = _pack_tris(scene, textured, cfg.mt == "mxu")  # (TP, 32|48[+8])
    clu = _cluster_aabbs(scene, csize)                           # (C, 8)
    ss = cfg.supers
    if ss:
        clu, sup = _pad_clusters_for_supers(clu, ss)
    TW = tri.shape[1]
    AR = _attr_rows(textured)

    # Ray-step lists (KConfig.step_lists): only meaningful when the caller
    # supplies a liveness mask (primary launches pass None or all-true).
    use_slists = cfg.step_lists and alive is not None and n_steps >= 16
    kernel = _make_kernel(SP, TP, float(t_min), tt_s, want_attrs, cfg,
                          textured,
                          n_real_clu=-(-scene.num_tris // csize),
                          has_spheres=scene.num_spheres > 0,
                          use_slists=use_slists)

    def ray_map(i, *s):
        return (0, s[0][i]) if s else (0, i)

    def fix_map(i, *s):
        return (0, 0)

    out_specs = [
        pl.BlockSpec((8, step), ray_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, step), ray_map, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((8, Rp), jnp.float32),
        jax.ShapeDtypeStruct((8, Rp), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((8, RT), jnp.float32),   # running best t
        pltpu.VMEM((8, RT), jnp.int32),     # running best prim id
        pltpu.VMEM((clu.shape[0], 128), jnp.int32),  # cluster-enter flags
        # (fixed 128-lane rows: one vreg per row keeps the dynamic
        # flag_ref[c, 0] read aligned for any RT; row count covers the
        # super-padded cluster set when KConfig.supers is on)
    ]
    if want_attrs:
        out_specs.append(pl.BlockSpec((AR, step), ray_map,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((AR, Rp), jnp.float32))
        scratch.append(pltpu.VMEM((AR, RT), jnp.float32))  # attr accum

    in_specs = [
        pl.BlockSpec((8, step), ray_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((SP, 16), fix_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((TP, TW), fix_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((clu.shape[0], 8), fix_map, memory_space=pltpu.VMEM),
    ]
    inputs = [rays, sph, tri, clu]
    if ss:
        in_specs.append(pl.BlockSpec((sup.shape[0], 8), fix_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(sup)
        scratch.append(pltpu.VMEM((sup.shape[0], 128), jnp.int32))

    cost = pl.CostEstimate(
        flops=Rp * (SP * 25 + TP * 45),
        bytes_accessed=Rp * 8 * 4 + SP * 64 + TP * 128 + Rp * 8,
        transcendentals=0,
    )
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=cfg.vmem_limit)
               if cfg.vmem_limit else None)
    if use_slists:
        live = jnp.any(rays[6].reshape(n_steps, step) > 0.5, axis=1)
        sidx = jnp.arange(n_steps, dtype=jnp.int32)
        key = jnp.where(live, sidx, n_steps + sidx)
        order = jnp.sort(key).astype(jnp.int32)
        cnt = live.sum().astype(jnp.int32)[None]
        entered = jnp.where(order < n_steps, order, 0)
        last = entered[jnp.maximum(cnt[0] - 1, 0)]
        sl = jnp.where(sidx < cnt[0], entered, last)
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_steps,),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=cost,
            compiler_params=cparams,
        )(sl, cnt, *inputs)
        # skipped steps' output blocks are unwritten memory: mask every
        # lane of a dead step to the kernel's dead-tile values (inf /
        # id 0 / zero rows — bit-identical to the dense grid). The wheres
        # fuse into the elementwise consumers; live_lane is (Rp,).
        live_lane = jnp.repeat(live, step)
        outs = list(outs)
        outs[0] = jnp.where(live_lane[None, :], outs[0], jnp.inf)
        outs[1] = jnp.where(live_lane[None, :], outs[1], jnp.int32(0))
        if want_attrs:
            outs[2] = jnp.where(live_lane[None, :], outs[2], 0.0)
    else:
        outs = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            cost_estimate=cost,
            compiler_params=cparams,
        )(*inputs)

    if want_attrs:
        t_out, id_out, attr_out = outs
        # slice off the sublane-tile padding rows (AR -> merged-table width)
        # NATIVE orientation: (merged-width, R) — columns on sublanes,
        # rays on lanes. Transposing to (R, 26|40) here would materialize
        # a 26->128 lane-padded buffer (4.9x HBM waste) per call; the
        # consumer (hit_attributes_from_rows) computes in SoA.
        return (t_out[0, :R], id_out[0, :R],
                attr_out[:merged_width(textured), :R])
    t_out, id_out = outs
    return t_out[0, :R], id_out[0, :R]


def _blocked_supers(cfg: KConfig, TB: int) -> int:
    """Supers size for the streaming kernel: cfg.supers when the block's
    super count (TB/csize/ss) is a whole f32 sublane tile (multiple of 8),
    else 0 (flat per-block prepass — Mosaic sublane dims must be >= 8)."""
    ss = cfg.supers
    if not ss:
        return 0
    s_blk = TB // cfg.cluster // ss
    return ss if (s_blk >= 8 and s_blk % 8 == 0) else 0


def _make_blocked_kernel(SP: int, TB: int, n_blocks: int, t_min: float,
                         tt_s: int, want_attrs: bool, cfg: KConfig,
                         textured: bool = False, num_real_tris: int = 0,
                         has_spheres: bool = True, use_lists: bool = False):
    """Streaming (tri-blocked) closest-hit kernel body.

    Grid is (n_ray_steps, n_tri_blocks) with the TRIANGLE dimension
    innermost (the Pallas TPU reduction pattern): for each ray step the
    triangle planes stream through VMEM in ``TB``-row blocks while the
    running best-(t, id) and the winner-attribute accumulator live in
    scratch that persists across the inner sweep. Removes the whole-scene
    VMEM residency requirement of ``_make_kernel`` (the ~30k-triangle cap)
    at the cost of re-streaming the scene once per ray step — the
    hierarchy levels (block AABB via its clusters' slab prepass, then
    cluster culling, both tightened by the running best-t from earlier
    blocks and the k==0 sphere fold) keep the COMPUTE proportional to
    what actually enters each tile's frustum.

    Winner attributes are extracted incrementally: after folding block k,
    lanes whose winner id lies in block k are zeroed and re-accumulated
    from this block's one-hot masked sums (sphere winners are extracted
    at k==0 and survive unless beaten).
    """
    RT, csize = cfg.rt, cfg.cluster
    tri_sub = min(cfg.tri_rows, csize)
    n_sph_chunks = SP // tt_s
    AR = _attr_rows(textured)
    sph_map, tri_map = _attr_copy_maps(textured)
    # third hierarchy level inside each streamed block (VERDICT r3 #5:
    # supers on the streaming workload): per-visit, slab the block's few
    # super AABBs first and only entering supers slab their member
    # clusters — replaces the every-visit (TB/csize, RT) flat prepass.
    # Valid only when the per-block super count is a whole sublane tile.
    ss = _blocked_supers(cfg, TB)

    def kernel(*refs):
        if use_lists:
            bl_ref, cnt_ref, *refs = refs
        if ss:
            (ray_ref, sph_ref, tri_ref, clu_ref, sup_ref, blk_ref,
             *outs_and_scratch) = refs
        else:
            ray_ref, sph_ref, tri_ref, clu_ref, blk_ref, \
                *outs_and_scratch = refs
        sup_flag_ref = None
        if ss:
            sup_flag_ref = outs_and_scratch.pop()
        if want_attrs:
            (t_out, id_out, attr_out, bt_ref, bi_ref, flag_ref,
             acc_ref) = outs_and_scratch
        else:
            t_out, id_out, bt_ref, bi_ref, flag_ref = outs_and_scratch
        # j is the grid position (drives init / final-write scheduling);
        # kb is the triangle block actually resident in tri_ref/clu_ref —
        # with lists they differ: kb = bl[i, j], and visits past the
        # step's entered-block count are dead (repeated kb, no re-DMA)
        j = pl.program_id(1)
        if use_lists:
            kb = bl_ref[pl.program_id(0), j]
            tri_live = j < cnt_ref[pl.program_id(0)]
        else:
            kb = j
            # fully-padded blocks (kb·TB beyond the real triangle count)
            # are skipped: their ±inf block AABB does not fail the slab
            # test on its own
            tri_live = j * jnp.int32(TB) < jnp.int32(num_real_tris)
        lo_gid = jnp.int32(SP) + kb * jnp.int32(TB)

        def one_tile(L):
            # L is a traced lane offset (dynamic tile loop): aligned
            # dynamic slice instead of the resident kernel's static unroll
            lanes = pl.ds(pl.multiple_of(L, RT), RT)
            ox, oy, oz = (ray_ref[0:1, lanes], ray_ref[1:2, lanes],
                          ray_ref[2:3, lanes])
            dx, dy, dz = (ray_ref[3:4, lanes], ray_ref[4:5, lanes],
                          ray_ref[5:6, lanes])
            alive = ray_ref[6:7, lanes] > 0.5
            a_quad = dx * dx + dy * dy + dz * dz
            invdx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
            invdy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
            invdz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)

            @pl.when(j == 0)
            def _():
                bt_ref[0:1, lanes] = jnp.full((1, RT), jnp.inf, jnp.float32)
                bi_ref[0:1, lanes] = jnp.full((1, RT), BIG_ID, jnp.int32)
                if want_attrs:
                    acc_ref[:, lanes] = jnp.zeros((AR, RT), jnp.float32)

            def fold_lanes(t, valid, ids):
                _min_fold_refs(t, valid, ids, bt_ref, bi_ref, lanes=lanes)

            def sphere_chunk(kk, carry):
                s = kk * tt_s
                sl = pl.ds(s, tt_s)
                t, ok = _sphere_pairs(
                    (sph_ref[sl, 0:1], sph_ref[sl, 1:2], sph_ref[sl, 2:3]),
                    sph_ref[sl, 3:4], (ox, oy, oz), (dx, dy, dz),
                    a_quad, t_min)
                valid = ok & (sph_ref[sl, 4:5] > 0.5) & alive
                ids = (jax.lax.broadcasted_iota(jnp.int32, (tt_s, RT), 0)
                       + jnp.int32(s))
                fold_lanes(t, valid, ids)
                return carry

            def tri_rows(s, rows):
                sl = pl.ds(s, rows)
                t, ok = _mt_pairs(
                    (tri_ref[sl, 0:1], tri_ref[sl, 1:2], tri_ref[sl, 2:3]),
                    (tri_ref[sl, 3:4], tri_ref[sl, 4:5], tri_ref[sl, 5:6]),
                    (tri_ref[sl, 6:7], tri_ref[sl, 7:8], tri_ref[sl, 8:9]),
                    (tri_ref[sl, 9:10], tri_ref[sl, 10:11],
                     tri_ref[sl, 11:12]),
                    (ox, oy, oz), (dx, dy, dz), t_min)
                valid = ok & alive
                ids = (jax.lax.broadcasted_iota(jnp.int32, (rows, RT), 0)
                       + (lo_gid + s))
                fold_lanes(t, valid, ids)

            C = clu_ref.shape[0]
            local_limit = jnp.clip(
                jnp.int32(-(-num_real_tris // csize))
                - kb * jnp.int32(C), 0, C)

            def cluster_prepass():
                tn, tf = _slab_test(
                    (clu_ref[:, 0:1], clu_ref[:, 1:2], clu_ref[:, 2:3]),
                    (clu_ref[:, 3:4], clu_ref[:, 4:5], clu_ref[:, 5:6]),
                    (ox, oy, oz), (invdx, invdy, invdz), t_min)
                # mask all-padding clusters (they pass the slab test
                # vacuously, see _cluster_aabbs): this block's real
                # clusters are those before the global real count
                cidx = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                enter = ((tf >= tn) & alive & (tn < bt_ref[0:1, lanes])
                         & (cidx < local_limit))
                flag = jnp.max(jnp.where(enter, 1, 0), axis=1, keepdims=True)
                flag_ref[:, :] = jnp.broadcast_to(flag, flag_ref.shape)
                first = jnp.min(jnp.where(flag > 0, cidx, C))
                last = jnp.max(jnp.where(flag > 0, cidx, -1))
                return first, last

            def super_prepass_blk():
                """Stage 1 of the in-block two-level prepass: slab this
                block's few super AABBs; member clusters slab lazily in
                super_body_blk, only for entering supers."""
                SB = sup_ref.shape[0]
                tn, tf = _slab_test(
                    (sup_ref[:, 0:1], sup_ref[:, 1:2], sup_ref[:, 2:3]),
                    (sup_ref[:, 3:4], sup_ref[:, 4:5], sup_ref[:, 5:6]),
                    (ox, oy, oz), (invdx, invdy, invdz), t_min)
                sidx = jax.lax.broadcasted_iota(jnp.int32, (SB, 1), 0)
                enter = ((tf >= tn) & alive & (tn < bt_ref[0:1, lanes])
                         & (sidx * ss < local_limit))
                sflag = jnp.max(jnp.where(enter, 1, 0), axis=1,
                                keepdims=True)
                sup_flag_ref[:, :] = jnp.broadcast_to(sflag,
                                                      sup_flag_ref.shape)
                sfirst = jnp.min(jnp.where(sflag > 0, sidx, SB))
                slast = jnp.max(jnp.where(sflag > 0, sidx, -1))
                return sfirst, slast

            def super_body_blk(s_id, carry):
                @pl.when(sup_flag_ref[s_id, 0] > 0)
                def _():
                    base = s_id * ss
                    sl = pl.ds(pl.multiple_of(base, ss), ss)
                    tn, tf = _slab_test(
                        (clu_ref[sl, 0:1], clu_ref[sl, 1:2],
                         clu_ref[sl, 2:3]),
                        (clu_ref[sl, 3:4], clu_ref[sl, 4:5],
                         clu_ref[sl, 5:6]),
                        (ox, oy, oz), (invdx, invdy, invdz), t_min)
                    cidx = (jax.lax.broadcasted_iota(jnp.int32, (ss, 1), 0)
                            + base)
                    enter = ((tf >= tn) & alive & (tn < bt_ref[0:1, lanes])
                             & (cidx < local_limit))
                    cflag = jnp.max(jnp.where(enter, 1, 0), axis=1,
                                    keepdims=True)
                    flag_ref[sl, :] = jnp.broadcast_to(
                        cflag, (ss, flag_ref.shape[1]))
                    for off in range(ss):
                        @pl.when(flag_ref[base + off, 0] > 0)
                        def _(off=off):
                            c = base + off
                            if cfg.mt == "mxu":
                                mt_cluster_mxu(c * csize)
                            else:
                                for r0 in range(0, csize, tri_sub):
                                    tri_rows(c * csize + r0, tri_sub)
                return carry

            if cfg.mt == "mxu":
                omat, dmat, oxd = _ray_mats(ray_ref, lanes)

            def mt_cluster_mxu(s):
                """Cluster MT via the shared MXU engine (_mt_mxu_pairs);
                streamed-block id base. Costs +8 plane columns of DMA per
                block — the A/B question on the DMA-heavy streaming
                path."""
                mo = 48 if textured else 32
                sl = pl.ds(s, csize)
                t, ok = _mt_mxu_pairs(tri_ref, sl, mo, dmat, omat, oxd,
                                      t_min)
                ids = (jax.lax.broadcasted_iota(jnp.int32, (csize, RT), 0)
                       + (lo_gid + s))
                fold_lanes(t, ok & alive, ids)

            def span_body(c, carry):
                @pl.when(flag_ref[c, 0] > 0)
                def _():
                    if cfg.mt == "mxu":
                        mt_cluster_mxu(c * csize)
                    else:
                        for r0 in range(0, csize, tri_sub):
                            tri_rows(c * csize + r0, tri_sub)
                return carry

            # whole-block AABB early-out: most (tile, block) visits die on
            # this single slab test (the top level of the hierarchy; at
            # 192k tris / 47 blocks a 16×8-pixel tile frustum enters only
            # a few blocks), making the dead-visit cost one (1, RT) op
            # instead of a full per-cluster prepass
            btn, btf = _slab_test(
                (blk_ref[kb, 0], blk_ref[kb, 1], blk_ref[kb, 2]),
                (blk_ref[kb, 3], blk_ref[kb, 4], blk_ref[kb, 5]),
                (ox, oy, oz), (invdx, invdy, invdz), t_min)
            block_enter = (btf >= btn) & alive & (btn < bt_ref[0:1, lanes])

            if has_spheres:
                @pl.when(jnp.any(alive) & (j == 0))
                def _():
                    jax.lax.fori_loop(0, n_sph_chunks, sphere_chunk, 0)

            @pl.when(jnp.any(block_enter) & tri_live)
            def _():
                # per-block prepass; an all-culled block never touches
                # its triangles — the mid level of the hierarchy.
                if ss:
                    sfirst, slast = super_prepass_blk()
                    jax.lax.fori_loop(sfirst, slast + 1, super_body_blk, 0)
                else:
                    first, last = cluster_prepass()
                    jax.lax.fori_loop(first, last + 1, span_body, 0)

            if want_attrs:
                best_id_v = bi_ref[0:1, lanes]

                def sph_extract(kk, carry):
                    sbase = kk * tt_s
                    ids = (jax.lax.broadcasted_iota(
                        jnp.int32, (tt_s, RT), 0) + jnp.int32(sbase))
                    ok = ids == best_id_v
                    for row, col in sph_map:
                        acc_ref[row:row + 1, lanes] += jnp.sum(
                            jnp.where(ok, sph_ref[pl.ds(sbase, tt_s),
                                                  col:col + 1], 0.0),
                            0, keepdims=True)
                    return carry

                # extraction chunk size decoupled from the cull cluster
                # size (same rationale as the resident kernel, r4)
                esize = 128 if TB % 128 == 0 else csize

                def tri_extract(c, carry):
                    lo_id = lo_gid + c * esize
                    in_chunk = ((best_id_v >= lo_id)
                                & (best_id_v < lo_id + esize))

                    @pl.when(jnp.any(in_chunk))
                    def _():
                        sl = pl.ds(c * esize, esize)
                        ids = (jax.lax.broadcasted_iota(
                            jnp.int32, (esize, RT), 0) + lo_id)
                        ok = ids == best_id_v
                        if cfg.extract == "mxu":
                            # same one-hot contraction as the resident
                            # kernel (KConfig.extract), merged width only
                            ew = 48 if textured else 32
                            rows_all = jax.lax.dot_general(
                                tri_ref[sl, 0:ew], ok.astype(jnp.float32),
                                (((0,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                            for row, col in tri_map:
                                acc_ref[row:row + 1, lanes] += \
                                    rows_all[col:col + 1, :]
                        else:
                            for row, col in tri_map:
                                acc_ref[row:row + 1, lanes] += jnp.sum(
                                    jnp.where(ok, tri_ref[sl, col:col + 1],
                                              0.0),
                                    0, keepdims=True)
                    return carry

                # incremental: lanes whose winner lives in THIS block are
                # zeroed and re-extracted; everyone else's attrs persist
                updated = ((best_id_v >= lo_gid)
                           & (best_id_v < lo_gid + jnp.int32(TB))
                           & tri_live)
                has_sph_win = (best_id_v < jnp.int32(SP)) & (j == 0)

                @pl.when(jnp.any(alive) & (jnp.any(updated)
                                           | jnp.any(has_sph_win)))
                def _():
                    upd_f = updated.astype(jnp.float32)        # (1, RT)
                    acc_ref[:, lanes] = jnp.where(
                        jnp.broadcast_to(upd_f > 0, (AR, RT)),
                        0.0, acc_ref[:, lanes])

                    if has_spheres:
                        @pl.when(jnp.any(has_sph_win))
                        def _():
                            jax.lax.fori_loop(0, n_sph_chunks,
                                              sph_extract, 0)

                    @pl.when(jnp.any(updated))
                    def _():
                        is_tw = updated
                        c_lo = (jnp.min(jnp.where(is_tw, best_id_v,
                                                  lo_gid + TB))
                                - lo_gid) // esize
                        c_hi = (jnp.max(jnp.where(is_tw, best_id_v, lo_gid))
                                - lo_gid) // esize
                        jax.lax.fori_loop(c_lo, jnp.minimum(
                            c_hi + 1, TB // esize), tri_extract, 0)

        def out_tile(L):
            """Final-visit output flush for the tile at lane offset L
            (reads only the launch-persistent scratch)."""
            lanes = pl.ds(pl.multiple_of(L, RT), RT)
            if want_attrs:
                attr_out[:, lanes] = acc_ref[:, lanes]
            best_t, best_id = bt_ref[0:1, lanes], bi_ref[0:1, lanes]
            t_out[:, lanes] = jnp.broadcast_to(best_t, (8, RT))
            id_out[:, lanes] = jnp.broadcast_to(
                jnp.where(best_id == BIG_ID, jnp.int32(0), best_id),
                (8, RT))

        n_tiles = cfg.blocked_step // RT

        # dead visits (list entries past the step's count, or fully-padded
        # trailing blocks on the dense grid) reduce to these two scalar
        # branches — no ray loads, no slab tests, no tile loop
        @pl.when(tri_live | (j == 0))
        def _():
            jax.lax.fori_loop(0, n_tiles,
                              lambda jt, c: (one_tile(jt * RT), c)[1], 0)

        @pl.when(j == n_blocks - 1)
        def _():
            jax.lax.fori_loop(0, n_tiles,
                              lambda jt, c: (out_tile(jt * RT), c)[1], 0)

    return kernel


def _block_lists(rays, blk, n_steps, step, n_blocks, TB, num_real_tris,
                 t_min):
    """Per-ray-step triangle-block visit lists for the scalar-prefetch
    streaming grid → (bl (n_steps, n_blocks) i32, cnt (n_steps,) i32).

    ``bl[i, :cnt[i]]`` are the ascending indices of blocks ANY live ray in
    step i enters (t_min-clamped slab test — a conservative superset of the
    kernel's per-visit test, which also tightens by the running best-t);
    entries past the count repeat the last entered block, so the kernel's
    dynamic index map holds still and Pallas skips the block re-DMA.
    Cost: one fused (Rp,)-wide slab test per block (lax.map keeps the
    temporaries at (Rp,), not (n_blocks, Rp)) — ~n_blocks · Rp · 32 B of
    traffic, amortized over the whole launch it gates.
    """
    o = (rays[0], rays[1], rays[2])
    d = (rays[3], rays[4], rays[5])
    alive = rays[6] > 0.5
    invd = tuple(1.0 / jnp.where(dd == 0.0, 1e-30, dd) for dd in d)

    def one_block(row):                                    # row: (8,)
        tn, tf = _slab_test((row[0], row[1], row[2]),
                            (row[3], row[4], row[5]), o, invd, t_min)
        enter = (tf >= tn) & alive                         # (Rp,)
        e2 = enter.reshape(n_steps, step)
        # per-step nearest entry distance — the near-to-far visit key
        tn2 = jnp.min(jnp.where(e2, tn.reshape(n_steps, step), jnp.inf),
                      axis=1)
        return jnp.any(e2, axis=1), tn2

    ent, tnear = jax.lax.map(one_block, blk)               # (nb, n_steps)
    ent, tnear = ent.T, tnear.T                            # (n_steps, nb)
    # all-padding blocks pass the slab test vacuously (±inf bounds — see
    # _cluster_aabbs); mask them by the static real-block count
    nb_real = -(-num_real_tris // TB)
    idx = jnp.arange(n_blocks, dtype=jnp.int32)
    ent = ent & (idx[None, :] < nb_real)
    cnt = ent.sum(axis=1).astype(jnp.int32)
    if os.environ.get("RTT_BLOCK_ORDER", "near") == "near":
        # NEAR-TO-FAR visit order (r5): sort each step's entered blocks by
        # their nearest frustum entry distance, so early hits tighten the
        # running best-t before far blocks are visited and the kernel's
        # per-tile block slab re-test (btn < best_t) kills them outright —
        # the streaming analog of the resident centerout traversal. On the
        # 192k teapots+terrain workload the depth range is large and
        # Morton id order is NOT near-to-far. The kernel requires no
        # monotonic id order; repeats still elide the re-DMA.
        order = jnp.argsort(jnp.where(ent, tnear, jnp.inf),
                            axis=1).astype(jnp.int32)
        entered = order
    else:
        # ascending Morton ids (the r3 behavior, kept as the A/B control)
        key = jnp.where(ent, idx[None, :], n_blocks + idx[None, :])
        entered = jnp.where(jnp.sort(key, axis=1) < n_blocks,
                            jnp.sort(key, axis=1), 0).astype(jnp.int32)
    last = jnp.take_along_axis(entered,
                               jnp.maximum(cnt - 1, 0)[:, None], axis=1)
    bl = jnp.where(idx[None, :] < cnt[:, None], entered, last)
    return bl, cnt


@functools.partial(jax.jit, static_argnames=("t_min", "want_attrs",
                                             "interpret", "cfg"))
def _nearest_hit_blocked_call(scene: Scene, o, d, t_min, alive, want_attrs,
                              interpret, cfg: KConfig):
    R = o.shape[0]
    SP, TP = scene.padded_spheres, scene.padded_tris
    tt_s = min(SPH_TT, SP)
    # supers is resident-kernel-only (the streaming path already has the
    # block level above clusters); the mt engine applies to both
    _validate_cfg(cfg)
    cfg = _fit_cluster(cfg._replace(supers=0), TP)
    csize, RT = cfg.cluster, cfg.rt
    # Mosaic requires the streamed cluster-AABB block's sublane dim
    # (TB // csize) to be divisible by 8 — round the per-block cluster
    # count up to a multiple of 8 (not just a floor of 8: tri_block=1536
    # would otherwise yield 12)
    g = max(8, -(-(cfg.tri_block // csize) // 8) * 8)
    TB = g * csize

    step = max(RT, (cfg.blocked_step // RT) * RT)
    cfg = cfg._replace(blocked_step=step)
    n_steps = -(-R // step)
    Rp = n_steps * step
    alive_f = (jnp.ones((R,), jnp.float32) if alive is None
               else alive.astype(jnp.float32))
    rays = jnp.concatenate([o, d, alive_f[:, None]], axis=1).T
    rays = jnp.pad(rays, ((0, 1), (0, Rp - R)))

    textured = want_attrs and scene.num_textures > 0
    sph = _pack_spheres(scene)
    tri = _pack_tris(scene, textured, cfg.mt == "mxu")
    clu = _cluster_aabbs(scene, csize)
    TPp = -(-TP // TB) * TB
    if TPp != TP:
        # zero geometry rows → det 0 → never valid; padding clusters are
        # masked OUT of the prepass by the real-cluster count (their
        # ±inf AABBs pass the slab test vacuously — see _cluster_aabbs)
        tri = jnp.pad(tri, ((0, TPp - TP), (0, 0)))
        pad_c = (TPp - TP) // csize
        clu = jnp.concatenate([
            clu,
            jnp.concatenate([jnp.full((pad_c, 3), jnp.inf, jnp.float32),
                             jnp.full((pad_c, 3), -jnp.inf, jnp.float32),
                             jnp.zeros((pad_c, 2), jnp.float32)], axis=1),
        ], axis=0)
    n_blocks = TPp // TB
    TW = tri.shape[1]
    AR = _attr_rows(textured)

    # whole-block AABBs from the (padded) cluster AABBs; all-padding
    # blocks inherit ±inf bounds and are never entered
    g = TB // csize
    blk = jnp.concatenate([
        clu[:, 0:3].reshape(n_blocks, g, 3).min(1),
        clu[:, 3:6].reshape(n_blocks, g, 3).max(1),
        jnp.zeros((n_blocks, 2), jnp.float32),
    ], axis=1)

    use_lists = cfg.block_lists and n_blocks > 1
    ss_b = _blocked_supers(cfg, TB)
    if ss_b:
        # per-block super AABBs from the padded cluster AABBs: supers
        # mixing real+padding clusters inherit the real extents (min/max
        # against +/-inf); all-padding supers are masked in-kernel by the
        # block-local real-cluster count
        n_sup_tot = TPp // csize // ss_b
        sup = jnp.concatenate([
            clu[:, 0:3].reshape(n_sup_tot, ss_b, 3).min(1),
            clu[:, 3:6].reshape(n_sup_tot, ss_b, 3).max(1),
            jnp.zeros((n_sup_tot, 2), jnp.float32),
        ], axis=1)
        s_blk = TB // csize // ss_b
    kernel = _make_blocked_kernel(SP, TB, n_blocks, float(t_min), tt_s,
                                  want_attrs, cfg, textured,
                                  num_real_tris=scene.num_tris,
                                  has_spheres=scene.num_spheres > 0,
                                  use_lists=use_lists)
    nsp = 2 if use_lists else 0   # index maps gain the scalar-prefetch refs

    def ray_map(i, k, *_):
        return (0, i)

    def fix_map(i, k, *_):
        return (0, 0)

    def blk_map(i, k, *s):
        # with lists, the resident triangle block is bl[i, k] (repeated
        # past the step's count → Pallas skips the re-DMA); without, k
        return (s[0][i, k], 0) if s else (k, 0)

    out_specs = [
        pl.BlockSpec((8, step), ray_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, step), ray_map, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((8, Rp), jnp.float32),
        jax.ShapeDtypeStruct((8, Rp), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((8, step), jnp.float32),   # running best t
        pltpu.VMEM((8, step), jnp.int32),     # running best prim id
        pltpu.VMEM((TB // csize, 128), jnp.int32),  # cluster-enter flags
    ]
    if want_attrs:
        out_specs.append(pl.BlockSpec((AR, step), ray_map,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((AR, Rp), jnp.float32))
        scratch.append(pltpu.VMEM((AR, step), jnp.float32))
    if ss_b:
        scratch.append(pltpu.VMEM((s_blk, 128), jnp.int32))

    in_specs = [
        pl.BlockSpec((8, step), ray_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((SP, 16), fix_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, TW), blk_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((TB // csize, 8), blk_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_blocks, 8), fix_map, memory_space=pltpu.VMEM),
    ]
    if ss_b:
        in_specs.insert(4, pl.BlockSpec((s_blk, 8), blk_map,
                                        memory_space=pltpu.VMEM))
    cost = pl.CostEstimate(
        flops=Rp * (SP * 25 + TPp * 45),
        bytes_accessed=(Rp * 8 * 4 + SP * 64
                        + n_steps * TPp * 128 * 4 + Rp * 8),
        transcendentals=0,
    )
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=cfg.vmem_limit)
               if cfg.vmem_limit else None)
    if use_lists:
        bl, cnt = _block_lists(rays, blk, n_steps, step, n_blocks, TB,
                               scene.num_tris, float(t_min))
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=nsp,
                grid=(n_steps, n_blocks),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=cost,
            compiler_params=cparams,
        )(bl, cnt, rays, sph, tri, clu, *((sup,) if ss_b else ()), blk)
    else:
        outs = pl.pallas_call(
            kernel,
            grid=(n_steps, n_blocks),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            cost_estimate=cost,
            compiler_params=cparams,
        )(rays, sph, tri, clu, *((sup,) if ss_b else ()), blk)

    if want_attrs:
        t_out, id_out, attr_out = outs
        # slice off the sublane-tile padding rows (AR -> merged-table width)
        # NATIVE orientation: (merged-width, R) — columns on sublanes,
        # rays on lanes. Transposing to (R, 26|40) here would materialize
        # a 26->128 lane-padded buffer (4.9x HBM waste) per call; the
        # consumer (hit_attributes_from_rows) computes in SoA.
        return (t_out[0, :R], id_out[0, :R],
                attr_out[:merged_width(textured), :R])
    t_out, id_out = outs
    return t_out[0, :R], id_out[0, :R]


def _make_scatter_kernel(Pp: int, WO: int, cfg: KConfig):
    """Body for scatter_rows_pallas: accumulate per-ray cotangent rows into
    the (Pp, WO) table output, which stays VMEM-resident across the ray-step
    grid (constant output index = the Pallas reduction pattern).

    Per 128-row table chunk containing any of the tile's ids, the update is
    ONE one-hot MXU contraction  m(csize, RT) @ g(RT, WO)  instead of WO
    per-row masked sums or an XLA scatter (row-rate-bound, ~40 ms per 2M
    rows). precision=HIGHEST: default-precision bf16 would round the
    cotangents to 8 mantissa bits (see the NEE one-hot note in
    docs/PERF_NOTES.md); with f32 inputs the products are exact and the
    MXU accumulates in f32.
    """
    RT = cfg.rt
    csize = 128
    n_chunks = Pp // csize

    def kernel(ids_ref, g_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:, :] = jnp.zeros((Pp, WO), jnp.float32)

        def one_tile(L):
            lanes = pl.ds(pl.multiple_of(L, RT), RT)
            ids_v = ids_ref[0:1, lanes]                      # (1, RT)
            g_blk = g_ref[lanes, :]                          # (RT, WO)
            # out-of-range ids are dropped (miss/dead lanes carry id >=
            # Pp; negatives would otherwise clamp into rows 0..127)
            valid = (ids_v >= 0) & (ids_v < Pp)

            def chunk(c, carry):
                base = c * csize
                in_chunk = (ids_v >= base) & (ids_v < base + csize)

                @pl.when(jnp.any(in_chunk))
                def _():
                    ids2 = (jax.lax.broadcasted_iota(
                        jnp.int32, (csize, RT), 0) + base)
                    m = (ids2 == ids_v).astype(jnp.float32)  # (csize, RT)
                    upd = jax.lax.dot_general(
                        m, g_blk, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (csize, WO)
                    out_ref[pl.ds(base, csize), :] += upd
                return carry

            # restrict the chunk sweep to the tile's id range (coherent
            # tiles touch few chunks; an all-miss tile sweeps nothing)
            c_lo = jnp.min(jnp.where(valid, ids_v, Pp)) // csize
            c_hi = jnp.max(jnp.where(valid, ids_v, 0)) // csize

            @pl.when(jnp.any(valid))
            def _():
                jax.lax.fori_loop(c_lo, jnp.minimum(c_hi + 1, n_chunks),
                                  chunk, 0)

        jax.lax.fori_loop(0, cfg.step_tiles,
                          lambda jt, c: (one_tile(jt * RT), c)[1], 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret", "cfg"))
def _scatter_rows_call(ids, g_rows, n_rows, interpret, cfg: KConfig):
    R, W = g_rows.shape
    RT = cfg.rt
    step = RT * cfg.step_tiles
    n_steps = -(-R // step)
    Rp = n_steps * step
    Pp = -(-n_rows // 128) * 128
    WO = -(-W // 8) * 8
    # rows 1-7 pad the id block to the f32/i32 sublane tile; padded ray
    # lanes carry id = Pp (ignored by the in-kernel valid mask)
    ids8 = jnp.pad(ids[None, :], ((0, 7), (0, Rp - R)),
                   constant_values=Pp)
    g = jnp.pad(g_rows, ((0, Rp - R), (0, WO - W)))

    out = pl.pallas_call(
        _make_scatter_kernel(Pp, WO, cfg),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((8, step), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((step, WO), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Pp, WO), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, WO), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=Rp * 128 * WO * 2,
            bytes_accessed=Rp * (4 + WO * 4) + Pp * WO * 4,
            transcendentals=0,
        ),
    )(ids8, g)
    return out[:n_rows, :W]


def scatter_rows_pallas(prim_id, g_rows, n_rows: int, interpret=False,
                        cfg: KConfig | None = None):
    """MXU scatter-add: ``zeros((n_rows, W)).at[prim_id].add(g_rows)`` for
    the winner-row VJP transpose. Lanes with ``prim_id`` outside
    [0, n_rows) are dropped (the caller maps miss lanes there). The table
    must fit VMEM (resident-scene sizes; callers fall back to the XLA
    scatter otherwise — see intersect._winner_rows_bwd)."""
    return _scatter_rows_call(prim_id, g_rows, n_rows,
                              _auto_interpret(interpret), cfg or env_config())


def _make_scatter_soa_kernel(Pp: int, WO: int, cfg: KConfig,
                             use_lists: bool = False):
    """Body for scatter_rows_soa_pallas: like _make_scatter_kernel but the
    cotangent block arrives in SoA orientation (WO, step) — rows/columns on
    sublanes, RAYS ON LANES, the exact layout the winner-row VJP's upstream
    autodiff produces (26|40, R). The one-hot update contracts both
    operands on their LANE axis: dot_general(m(csize, RT), g(WO, RT),
    contracting (1,)x(1,)) -> (csize, WO). Removes the XLA-side
    (26, R) -> (R, 26) transpose whose lane-padded materializations
    dominated the backward (r4 profile: the transposed row-major buffers
    cost more than every kernel in the VJP combined).

    With ``use_lists`` the grid rides a scalar-prefetch STEP list (the
    streaming kernel's block-list pattern): visit i processes ray step
    sl[i]; visits past the live-step count repeat the last live step (no
    re-DMA) and reduce to one scalar compare. The whole-frame backward
    runs one full-R scatter PER BOUNCE while late-bounce wavefronts are
    nearly all-miss — per-grid-step machinery on hit-free steps was the
    scatter's dominant cost (r5: 9.1 ms/scatter at 1080p regardless of
    liveness; an XLA-side tile-compaction attempt measured a net LOSS,
    gather machinery > savings — see docs/PERF_NOTES.md r5)."""
    RT = cfg.rt
    csize = 128
    n_chunks = Pp // csize

    def kernel(*refs):
        if use_lists:
            sl_ref, cnt_ref, ids_ref, g_ref, out_ref = refs
        else:
            ids_ref, g_ref, out_ref = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:, :] = jnp.zeros((Pp, WO), jnp.float32)

        if use_lists:
            live_visit = i < cnt_ref[0]
        else:
            live_visit = True

        def one_tile(L):
            lanes = pl.ds(pl.multiple_of(L, RT), RT)
            ids_v = ids_ref[0:1, lanes]                      # (1, RT)
            g_blk = g_ref[:, lanes]                          # (WO, RT)
            valid = (ids_v >= 0) & (ids_v < Pp)

            def chunk(c, carry):
                base = c * csize
                in_chunk = (ids_v >= base) & (ids_v < base + csize)

                @pl.when(jnp.any(in_chunk))
                def _():
                    ids2 = (jax.lax.broadcasted_iota(
                        jnp.int32, (csize, RT), 0) + base)
                    m = (ids2 == ids_v).astype(jnp.float32)  # (csize, RT)
                    upd = jax.lax.dot_general(
                        m, g_blk, (((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (csize, WO)
                    out_ref[pl.ds(base, csize), :] += upd
                return carry

            c_lo = jnp.min(jnp.where(valid, ids_v, Pp)) // csize
            c_hi = jnp.max(jnp.where(valid, ids_v, 0)) // csize

            @pl.when(jnp.any(valid))
            def _():
                jax.lax.fori_loop(c_lo, jnp.minimum(c_hi + 1, n_chunks),
                                  chunk, 0)

        @pl.when(live_visit)
        def _():
            jax.lax.fori_loop(0, cfg.step_tiles,
                              lambda jt, c: (one_tile(jt * RT), c)[1], 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret", "cfg",
                                             "lists"))
def _scatter_rows_soa_call(ids, g_soa, n_rows, interpret, cfg: KConfig,
                           lists: bool = True):
    W, R = g_soa.shape
    RT = cfg.rt
    step = RT * cfg.step_tiles
    n_steps = -(-R // step)
    Rp = n_steps * step
    Pp = -(-n_rows // 128) * 128
    WO = -(-W // 8) * 8
    ids8 = jnp.pad(ids[None, :], ((0, 7), (0, Rp - R)),
                   constant_values=Pp)
    g = jnp.pad(g_soa, ((0, WO - W), (0, Rp - R)))

    # Step lists (r5): visit only ray steps that carry a REAL-row id.
    # ids in [n_rows, Pp) land in pad rows the caller's slice discards,
    # so skipping their steps returns the identical value; per-tile fp
    # grouping of surviving steps is untouched (unlike XLA-side tile
    # compaction, which regroups lanes across contraction tiles AND
    # measured a net loss — docs/PERF_NOTES.md r5).
    use_lists = lists and n_steps >= 16
    if use_lists:
        live = jnp.any(((ids8[0] >= 0) & (ids8[0] < n_rows))
                       .reshape(n_steps, step), axis=1)
        sidx = jnp.arange(n_steps, dtype=jnp.int32)
        key = jnp.where(live, sidx, n_steps + sidx)
        order = jnp.sort(key).astype(jnp.int32)
        cnt = live.sum().astype(jnp.int32)[None]
        entered = jnp.where(order < n_steps, order, 0)
        last = entered[jnp.maximum(cnt[0] - 1, 0)]
        sl = jnp.where(sidx < cnt[0], entered, last)
        out = pl.pallas_call(
            _make_scatter_soa_kernel(Pp, WO, cfg, use_lists=True),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_steps,),
                in_specs=[
                    pl.BlockSpec((8, step), lambda i, *s: (0, s[0][i]),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((WO, step), lambda i, *s: (0, s[0][i]),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((Pp, WO), lambda i, *s: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((Pp, WO), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=Rp * 128 * WO * 2,
                bytes_accessed=Rp * (4 + WO * 4) + Pp * WO * 4,
                transcendentals=0,
            ),
        )(sl, cnt, ids8, g)
        return out[:n_rows, :W]

    out = pl.pallas_call(
        _make_scatter_soa_kernel(Pp, WO, cfg),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((8, step), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WO, step), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Pp, WO), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, WO), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=Rp * 128 * WO * 2,
            bytes_accessed=Rp * (4 + WO * 4) + Pp * WO * 4,
            transcendentals=0,
        ),
    )(ids8, g)
    return out[:n_rows, :W]


def scatter_rows_soa_pallas(prim_id, g_soa, n_rows: int, interpret=False,
                            cfg: KConfig | None = None):
    """MXU scatter-add taking the cotangent in SoA orientation:
    ``zeros((n_rows, W)).at[prim_id].add(g_soa.T)`` without the host-side
    transpose (see _make_scatter_soa_kernel). ``g_soa``: (W, R). Grid
    steps without any contributing lane are skipped via a scalar-prefetch
    step list (RTT_SCATTER_LISTS=0 disables)."""
    return _scatter_rows_soa_call(
        prim_id, g_soa, n_rows, _auto_interpret(interpret),
        cfg or env_config(),
        lists=os.environ.get("RTT_SCATTER_LISTS", "1") != "0")


def _use_blocked(scene: Scene, cfg: KConfig) -> bool:
    """Streaming path selection: the packed triangle planes cost
    TP × 128 lanes × 4 B of VMEM (lane padding); past the budget the
    resident kernel can't fit and the blocked kernel takes over."""
    if cfg.blocked == "never":
        return False
    if cfg.blocked == "force":
        return True
    return scene.padded_tris * 128 * 4 > cfg.vmem_tri_budget


def _make_anyhit_kernel(SP: int, TP: int, t_min: float, t_max: float,
                        tt_s: int, cfg: KConfig,
                        n_real_clu: int | None = None,
                        has_spheres: bool = True,
                        use_slists: bool = False):
    """Occlusion (shadow-ray) kernel: is ANY primitive in (t_min, t_max)
    along o + t*d? Early-exits per tile — unlike closest-hit there is no
    best-t to maintain, a single blocking hit settles a lane, and a tile
    whose live lanes are all blocked skips its remaining clusters. Replaces
    the full closest-hit occlusion query (VERDICT r1 #5: NEE paid double
    intersection cost for no reason)."""
    n_sph_chunks = SP // tt_s
    RT, csize = cfg.rt, cfg.cluster
    tri_sub = min(cfg.tri_rows, csize)
    if n_real_clu is None:
        n_real_clu = TP // csize
    ss = cfg.supers
    n_real_super = -(-n_real_clu // ss) if ss else 0

    def kernel(*refs):
        sup_ref = sup_flag_ref = None
        refs = list(refs)
        if use_slists:
            sl_ref, cnt_ref, *refs = refs     # ray-step lists (r5)
        if ss:
            ray_ref, sph_ref, tri_ref, clu_ref, sup_ref, out, blk_ref, \
                flag_ref, sup_flag_ref = refs
        else:
            ray_ref, sph_ref, tri_ref, clu_ref, out, blk_ref, \
                flag_ref = refs

        def one_tile(L):
            lanes = pl.ds(pl.multiple_of(L, RT), RT)
            # whole-tile liveness gate (r4, same as the closest-hit
            # kernel): dead shadow tiles skip loads + reciprocals too
            alive_any = jnp.any(ray_ref[6:7, lanes] > 0.5)
            blk_ref[0:1, :] = jnp.zeros((1, RT), jnp.float32)

            @pl.when(alive_any)
            def _run_tile():
                ox, oy, oz = (ray_ref[0:1, lanes], ray_ref[1:2, lanes],
                              ray_ref[2:3, lanes])
                dx, dy, dz = (ray_ref[3:4, lanes], ray_ref[4:5, lanes],
                              ray_ref[5:6, lanes])
                alive = ray_ref[6:7, lanes] > 0.5
                a_quad = dx * dx + dy * dy + dz * dz
                invdx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
                invdy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
                invdz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)


                def sphere_chunk(k, carry):
                    s = k * tt_s
                    sl = pl.ds(s, tt_s)
                    t, ok = _sphere_pairs(
                        (sph_ref[sl, 0:1], sph_ref[sl, 1:2], sph_ref[sl, 2:3]),
                        sph_ref[sl, 3:4], (ox, oy, oz), (dx, dy, dz),
                        a_quad, t_min)
                    hit = ok & (t < t_max) & (sph_ref[sl, 4:5] > 0.5) & alive
                    any_hit = jnp.max(jnp.where(hit, 1.0, 0.0), axis=0,
                                      keepdims=True)
                    blk_ref[0:1, :] = jnp.maximum(blk_ref[0:1, :], any_hit)
                    return carry

                def tri_rows(s, rows):
                    sl = pl.ds(s, rows)
                    t, ok = _mt_pairs(
                        (tri_ref[sl, 0:1], tri_ref[sl, 1:2], tri_ref[sl, 2:3]),
                        (tri_ref[sl, 3:4], tri_ref[sl, 4:5], tri_ref[sl, 5:6]),
                        (tri_ref[sl, 6:7], tri_ref[sl, 7:8], tri_ref[sl, 8:9]),
                        (tri_ref[sl, 9:10], tri_ref[sl, 10:11],
                         tri_ref[sl, 11:12]),
                        (ox, oy, oz), (dx, dy, dz), t_min)
                    hit = ok & (t < t_max) & alive
                    any_hit = jnp.max(jnp.where(hit, 1.0, 0.0), axis=0,
                                      keepdims=True)
                    blk_ref[0:1, :] = jnp.maximum(blk_ref[0:1, :], any_hit)

                def prepass():
                    C = clu_ref.shape[0]
                    tn, tf = _slab_test(
                        (clu_ref[:, 0:1], clu_ref[:, 1:2], clu_ref[:, 2:3]),
                        (clu_ref[:, 3:4], clu_ref[:, 4:5], clu_ref[:, 5:6]),
                        (ox, oy, oz), (invdx, invdy, invdz), t_min)
                    # the shadow segment ends at t_max: clusters entirely
                    # beyond it can't block; all-padding clusters are masked
                    # by the real count (vacuous slab pass, _cluster_aabbs)
                    cidx = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                    enter = ((tf >= tn) & (tn < t_max) & alive
                             & (cidx < jnp.int32(n_real_clu)))
                    flag = jnp.max(jnp.where(enter, 1, 0), axis=1, keepdims=True)
                    flag_ref[:, :] = jnp.broadcast_to(flag, flag_ref.shape)
                    first = jnp.min(jnp.where(flag > 0, cidx, C))
                    last = jnp.max(jnp.where(flag > 0, cidx, -1))
                    return first, last

                if cfg.mt == "mxu":
                    omat, dmat, oxd = _ray_mats(ray_ref, lanes)

                def mt_cluster_mxu(s):
                    """Any-hit MT via the shared MXU engine (_mt_mxu_pairs);
                    blocking test instead of fold."""
                    sl = pl.ds(s, csize)
                    t, ok = _mt_mxu_pairs(tri_ref, sl, 32, dmat, omat, oxd,
                                          t_min)
                    hit = ok & (t < t_max) & alive
                    any_hit = jnp.max(jnp.where(hit, 1.0, 0.0), axis=0,
                                      keepdims=True)
                    blk_ref[0:1, :] = jnp.maximum(blk_ref[0:1, :], any_hit)

                def tri_cluster(s):
                    if cfg.mt == "mxu":
                        mt_cluster_mxu(s)
                        return
                    for r0 in range(0, csize, tri_sub):
                        tri_rows(s + r0, tri_sub)

                def span_body(c, carry):
                    # early-exit: once every live lane is blocked, remaining
                    # clusters are skipped (the any-hit advantage)
                    settled = jnp.all((blk_ref[0:1, :] > 0.5) | ~alive)

                    @pl.when((flag_ref[c, 0] > 0) & ~settled)
                    def _():
                        tri_cluster(c * csize)
                    return carry

                def super_prepass():
                    SCr = sup_ref.shape[0]
                    tn, tf = _slab_test(
                        (sup_ref[:, 0:1], sup_ref[:, 1:2], sup_ref[:, 2:3]),
                        (sup_ref[:, 3:4], sup_ref[:, 4:5], sup_ref[:, 5:6]),
                        (ox, oy, oz), (invdx, invdy, invdz), t_min)
                    sidx = jax.lax.broadcasted_iota(jnp.int32, (SCr, 1), 0)
                    enter = ((tf >= tn) & (tn < t_max) & alive
                             & (sidx < jnp.int32(n_real_super)))
                    sflag = jnp.max(jnp.where(enter, 1, 0), axis=1,
                                    keepdims=True)
                    sup_flag_ref[:, :] = jnp.broadcast_to(sflag,
                                                          sup_flag_ref.shape)
                    sfirst = jnp.min(jnp.where(sflag > 0, sidx, SCr))
                    slast = jnp.max(jnp.where(sflag > 0, sidx, -1))
                    return sfirst, slast

                def super_body(s_id, carry):
                    settled_s = jnp.all((blk_ref[0:1, :] > 0.5) | ~alive)

                    @pl.when((sup_flag_ref[s_id, 0] > 0) & ~settled_s)
                    def _():
                        base = s_id * ss
                        sl = pl.ds(pl.multiple_of(base, ss), ss)
                        tn, tf = _slab_test(
                            (clu_ref[sl, 0:1], clu_ref[sl, 1:2],
                             clu_ref[sl, 2:3]),
                            (clu_ref[sl, 3:4], clu_ref[sl, 4:5],
                             clu_ref[sl, 5:6]),
                            (ox, oy, oz), (invdx, invdy, invdz), t_min)
                        cidx = (jax.lax.broadcasted_iota(jnp.int32, (ss, 1), 0)
                                + base)
                        enter = ((tf >= tn) & (tn < t_max) & alive
                                 & (cidx < jnp.int32(n_real_clu)))
                        cflag = jnp.max(jnp.where(enter, 1, 0), axis=1,
                                        keepdims=True)
                        flag_ref[sl, :] = jnp.broadcast_to(
                            cflag, (ss, flag_ref.shape[1]))
                        for off in range(ss):
                            settled_c = jnp.all((blk_ref[0:1, :] > 0.5)
                                                | ~alive)

                            @pl.when((flag_ref[base + off, 0] > 0)
                                     & ~settled_c)
                            def _(off=off):
                                tri_cluster((base + off) * csize)
                    return carry

                @pl.when(jnp.any(alive))
                def _():
                    if has_spheres:
                        jax.lax.fori_loop(0, n_sph_chunks, sphere_chunk, 0)
                    if n_real_clu > 0:
                        @pl.when(jnp.any(alive & ~(blk_ref[0:1, :] > 0.5)))
                        def _():
                            if ss:
                                sfirst, slast = super_prepass()
                                jax.lax.fori_loop(sfirst, slast + 1,
                                                  super_body, 0)
                            else:
                                first, last = prepass()
                                jax.lax.fori_loop(first, last + 1, span_body, 0)

            out[:, lanes] = jnp.broadcast_to(blk_ref[0:1, :], (8, RT))

        def run_tiles():
            if cfg.step_tiles <= 2:
                # static unroll: constant lane offsets lower to static
                # slices (cheaper scalar addressing, cross-tile
                # pipelining); bounded at 2 because trace/lowering time
                # scales with the unroll (measured 40 s -> 200+ s at
                # step_tiles=4)
                for _j in range(cfg.step_tiles):
                    one_tile(_j * RT)
            else:
                def tile_body(j, carry):
                    one_tile(j * RT)
                    return carry

                jax.lax.fori_loop(0, cfg.step_tiles, tile_body, 0)

        if use_slists:
            @pl.when(pl.program_id(0) < cnt_ref[0])
            def _():
                run_tiles()
        else:
            run_tiles()

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "t_max", "interpret",
                                             "cfg"))
def _anyhit_call(scene: Scene, o, d, t_min, t_max, alive, interpret,
                 cfg: KConfig):
    R = o.shape[0]
    SP, TP = scene.padded_spheres, scene.padded_tris
    tt_s = min(SPH_TT, SP)
    _validate_cfg(cfg)
    cfg = _fit_cluster(cfg, TP)
    csize, RT = cfg.cluster, cfg.rt

    step = RT * cfg.step_tiles
    n_steps = -(-R // step)
    Rp = n_steps * step
    alive_f = (jnp.ones((R,), jnp.float32) if alive is None
               else alive.astype(jnp.float32))
    rays = jnp.concatenate([o, d, alive_f[:, None]], axis=1).T
    rays = jnp.pad(rays, ((0, 1), (0, Rp - R)))

    sph = _pack_spheres(scene)
    tri = _pack_tris(scene, False, cfg.mt == "mxu")
    clu = _cluster_aabbs(scene, csize)
    ss = cfg.supers
    if ss:
        clu, sup = _pad_clusters_for_supers(clu, ss)

    use_slists = cfg.step_lists and alive is not None and n_steps >= 16
    kernel = _make_anyhit_kernel(SP, TP, float(t_min), float(t_max), tt_s,
                                 cfg,
                                 n_real_clu=-(-scene.num_tris // csize),
                                 has_spheres=scene.num_spheres > 0,
                                 use_slists=use_slists)

    def ray_map(i, *s):
        return (0, s[0][i]) if s else (0, i)

    def fix_map(i, *s):
        return (0, 0)

    in_specs = [
        pl.BlockSpec((8, step), ray_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((SP, 16), fix_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((TP, tri.shape[1]), fix_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((clu.shape[0], 8), fix_map, memory_space=pltpu.VMEM),
    ]
    inputs = [rays, sph, tri, clu]
    scratch = [
        pltpu.VMEM((8, RT), jnp.float32),           # blocked mask
        pltpu.VMEM((clu.shape[0], 128), jnp.int32),  # cluster flags
    ]
    if ss:
        in_specs.append(pl.BlockSpec((sup.shape[0], 8), fix_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(sup)
        scratch.append(pltpu.VMEM((sup.shape[0], 128), jnp.int32))
    out_spec = pl.BlockSpec((8, step), ray_map, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((8, Rp), jnp.float32)
    cost = pl.CostEstimate(
        flops=Rp * (SP * 25 + TP * 45) // 4,
        bytes_accessed=Rp * 8 * 4 + SP * 64 + TP * 128 + Rp * 4,
        transcendentals=0,
    )
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=cfg.vmem_limit)
               if cfg.vmem_limit else None)
    if use_slists:
        # shadow wavefronts are the sparsest launches of all (nee_lane
        # liveness); same step-list scheme as the closest-hit kernel,
        # skipped steps mask to un-blocked
        live = jnp.any(rays[6].reshape(n_steps, step) > 0.5, axis=1)
        sidx = jnp.arange(n_steps, dtype=jnp.int32)
        key = jnp.where(live, sidx, n_steps + sidx)
        order = jnp.sort(key).astype(jnp.int32)
        cnt = live.sum().astype(jnp.int32)[None]
        entered = jnp.where(order < n_steps, order, 0)
        last = entered[jnp.maximum(cnt[0] - 1, 0)]
        sl = jnp.where(sidx < cnt[0], entered, last)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_steps,),
                in_specs=in_specs,
                out_specs=out_spec,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=cost,
            compiler_params=cparams,
        )(sl, cnt, *inputs)
        live_lane = jnp.repeat(live, step)
        out = jnp.where(live_lane[None, :], out, 0.0)
    else:
        out = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            cost_estimate=cost,
            compiler_params=cparams,
        )(*inputs)
    return out[0, :R] > 0.5


def anyhit_pallas(scene: Scene, o, d, t_min=1e-4, t_max=1.0 - 1e-3,
                  alive=None, interpret=False, cfg: KConfig | None = None):
    """Early-exit occlusion query: True where ANY primitive intersects
    o + t*d with t in [t_min, t_max) (t in units of |d|, so d spans the
    shadow segment). Much cheaper than closest-hit for NEE shadow rays:
    no winner tracking, first hit settles a lane, saturated tiles skip
    remaining clusters."""
    return _anyhit_call(scene, o, d, t_min, t_max, alive,
                        _auto_interpret(interpret), cfg or env_config())


def _auto_interpret(interpret):
    # the kernel runs in interpreter mode automatically off-TPU, so the
    # pallas backend is usable (and testable) on the CPU harness
    return interpret or jax.default_backend() != "tpu"


def nearest_hit_pallas(scene: Scene, o, d, t_min=1e-4, alive=None,
                       interpret=False, cfg: KConfig | None = None):
    """Closest hit for (R, 3) rays → (t (R,), prim_id (R,) int32).

    Drop-in replacement for ops.intersect.nearest_hit_jnp (same id
    convention); R is padded to a multiple of the grid step internally.
    ``alive`` ((R,) bool, optional) marks live wavefront lanes — dead lanes
    return miss and cost (nearly) nothing once sorted into whole-dead
    tiles. ``cfg`` overrides the RTT_* env knobs (see KConfig). Scenes
    whose packed planes exceed the VMEM budget stream through the
    tri-blocked kernel automatically (KConfig.blocked).
    """
    cfg = cfg or env_config()
    call = (_nearest_hit_blocked_call if _use_blocked(scene, cfg)
            else _nearest_hit_call)
    return call(scene, o, d, t_min, alive, False,
                _auto_interpret(interpret), cfg)


def nearest_hit_attrs_pallas(scene: Scene, o, d, t_min=1e-4, alive=None,
                             interpret=False, cfg: KConfig | None = None):
    """Closest hit PLUS the winner's merged-table row extracted in-kernel:
    returns (t (R,), prim_id (R,), rows (26|40, R)) where rows follow
    intersect._pack_attrs column for column — bit-identical to
    ``_pack_attrs(scene)[prim_id].T`` on hit lanes (the plane arrays store
    the same precomputed columns), all-zero on miss lanes. Replaces the
    XLA winner-gather (hit_attributes) on the forward path; the
    differentiable recompute runs outside (hit_attributes_from_rows), and
    intersect._winner_rows' custom VJP turns the row cotangents into one
    scatter-add."""
    cfg = cfg or env_config()
    call = (_nearest_hit_blocked_call if _use_blocked(scene, cfg)
            else _nearest_hit_call)
    return call(scene, o, d, t_min, alive, True,
                _auto_interpret(interpret), cfg)
