"""Pallas TPU kernel: gather-free bounded-displacement bilinear sampling
with DATA-ADAPTIVE work.

follow_flows' binary flow-map composition is dominated by bilinear
resampling passes. XLA lowers per-pixel resampling to a serialized
~1M-index gather (~90 ms per pass at 1024²x4 on v5e); a bounded
displacement lets the sample instead be computed as a one-hot select
over integer offsets — pure VPU work over VMEM-resident row stripes.

The round-3 static kernel looped over the full worst-case offset square
((2D)² terms), which made it useless past D≈32 (cost caught up with the
gather). This version keeps the STATIC worst-case halo (correctness:
every offset the caller's bound permits is covered by the DMA'd stripe)
but sizes the LOOPS from the measured per-stripe offset ranges, passed
in as SMEM scalars: real flow fields displace pixels by at most a cell
radius (and noise flows random-walk to ≤ ~10 px after 200 steps), so the
executed term count collapses from (2D)² to (actual range)² — measured
~25x less work at the production composition's late passes (bounds
64-145) with bit-identical results (skipped terms are exactly the
all-zero selects; every output pixel still takes its unique matching
term in the same accumulation order).

Factored form (per output pixel exactly one (oy, ox) offset matches):

    G_d   = Σ_dx (ox == dx) · ((1−wx)·F_d[·, j+dx] + wx·F_d[·, j+dx+1])
    out   = Σ_d  ((oy == d)·(1−wy) + (oy == d−1)·wy) · G_d

with F_d the field rows at offset d, accessed through a DMA'd stripe with
D-row halos. Row access uses a DYNAMIC pltpu.roll of the stripe (Mosaic
supports dynamic rotate; a dynamic sublane slice start would not be
legal) and lane shifts are circular rolls; wrapped values only appear
where the select mask is zero (positions are clipped to the image
interior before offsets are formed, exactly as dynamics/masks.py
``_shift_sample2`` does).

This evaluates the same four-corner bilinear formula as the XLA samplers
but in factored (two-level lerp) association order — not bitwise
identical to ``_bilinear2``'s flat four-term sum, which is fine: program
identity only matters WITHIN one compiled path (eval and eval_batch share
the sampler choice AND the per-image stripe bounds, so they stay
bit-identical), not across backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budgets for stripe + working set (bytes). The STRICT budget keeps
# kernels inside Mosaic's default 16 MB scoped-VMEM limit; geometries
# that don't fit it (e.g. W ≥ 1280 at the late composition bounds) get a
# second chance against the EXTENDED budget with the per-kernel
# ``vmem_limit_bytes`` raised to match — a v5e core has 128 MB of VMEM,
# the 16 MB cap is just the compiler default. Without this, larger
# production tiles fell off the Pallas path onto the XLA gather, whose
# (N, 2, 2, 2) bilinear-footprint temp gets a 64x tile-padding blowup
# (12.5 GB at 1280²x4 — an instant HBM OOM).
_VMEM_BUDGET = 12 * 1024 * 1024
_VMEM_BUDGET_EXT = 48 * 1024 * 1024
_VMEM_LIMIT_EXT = 64 * 1024 * 1024


def _row_preference(Dh: int) -> tuple[int, ...]:
    """Row-block preference order, smallest-first once the displacement
    halo exceeds the stripe scale.

    The adaptive loops are sized by PER-STRIPE offset ranges, so shorter
    stripes see tighter y-ranges whenever content displaces further than
    the stripe height: at the bench load (design field, ~26 px max cell
    displacement) the r5 census (tools/ff_ranges.py) measured mean n_d
    28 → 15 going R 128 → 16 on every pass with D ≥ 17, and the per-pass
    walls dropped accordingly (R16 A/B: bound-16 pass 51.8 → 35 ms class,
    late bound-64..145 passes ~87-99 → ~60 ms class) — the extra halo DMA
    (stripes overlap more at small R) stays overlapped. Small bounds keep
    the large-R order: their ranges are range-bound by D itself, and the
    8x stripe count only adds per-stripe fixed costs.

    CLASSPOSE_SAMPLER_R forces a specific R to the front (A/B knob).
    """
    import os

    order = (128, 64, 32, 16, 8) if Dh <= 8 else (16, 32, 64, 128, 8)
    ov = os.environ.get("CLASSPOSE_SAMPLER_R")
    if ov:
        r = int(ov)
        order = (r,) + tuple(x for x in order if x != r)
    return order


def _pick_row_block(H: int, W: int, Dh: int, C: int = 2) -> int | None:
    """First row block in the preference order whose stripe + working
    set fits a VMEM budget (the strict default-limit one first, then the
    extended one)."""
    for budget in (_VMEM_BUDGET, _VMEM_BUDGET_EXT):
        for R in _row_preference(Dh):
            if H % R or H < R + 2 * Dh:
                continue
            if _kernel_vmem_bytes(R, W, Dh, C) <= budget:
                return R
    return None


def _kernel_vmem_bytes(R: int, W: int, Dh: int, C: int) -> int:
    """Estimated kernel VMEM footprint: stripe scratch + its dynamic-roll
    result + blocked I/O and loop temporaries."""
    stripe = C * (R + 4 * Dh) * W * 4  # f32 scratch
    rolled = stripe                    # dynamic-roll result
    work = 8 * (2 * R * W * 4)         # Fd/prev/nxt/g/o/py/px/misc
    return stripe + rolled + work


def _vmem_limit(R: int, W: int, Dh: int, C: int) -> int | None:
    """``vmem_limit_bytes`` for the pallas_call: None inside the default
    16 MB Mosaic limit, the extended limit when the kernel needs more."""
    if _kernel_vmem_bytes(R, W, Dh, C) <= _VMEM_BUDGET:
        return None
    return _VMEM_LIMIT_EXT


def sampler_supported(H: int, W: int, D: int, C: int = 2) -> bool:
    """Whether the adaptive stripe sampler can run at this geometry."""
    Dh = -(-D // 8) * 8
    return (
        H % 8 == 0
        and W % 128 == 0
        and _pick_row_block(H, W, Dh, C) is not None
    )


def _stripe_bounds(py, px, H, W, R, D):
    """Per-(batch, stripe) integer offset ranges, clamped to the static
    worst case. Must mirror the kernel's y0/x0 arithmetic exactly."""
    B = py.shape[0]
    nR = H // R
    gi = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)[None]
    gj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)[None]
    y0 = jnp.clip(jnp.floor(py), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(px), 0, W - 2).astype(jnp.int32)
    oy = (y0 - gi).reshape(B, nR, R * W)
    ox = (x0 - gj).reshape(B, nR, R * W)
    lo = -D
    hi = D
    return jnp.stack(
        [
            jnp.clip(oy.min(axis=2), lo, hi),
            jnp.clip(oy.max(axis=2), lo, hi),
            jnp.clip(ox.min(axis=2), lo, hi),
            jnp.clip(ox.max(axis=2), lo, hi),
        ],
        axis=2,
    )  # (B, nR, 4) int32


def _sample_kernel(bounds_ref, py_ref, px_ref, u_hbm, o_ref, scratch, sem,
                   *, D, Dh, R, H, W):
    b = pl.program_id(0)
    r = pl.program_id(1)
    nR = pl.num_programs(1)

    # stripe row s ↔ global row start_u + s with start_u = r·R − 2·Dh
    # (Dh = D rounded up to the sublane tile of 8, so every DMA slice
    # start/length is 8-aligned). The compute below reads stripe rows
    # [2Dh−D, R+2Dh+D) (= global [r·R − D, r·R + R + D), the bilinear
    # footprint of this row block). The DMA copies the R+2Dh-row valid
    # window clamped to the image; the ≤D stripe rows that stay unwritten
    # at the first/last block map to global rows outside [0, H) — they
    # are never *selected* (positions are clipped to the interior), but
    # 0·garbage would still poison the masked sums, so an aligned margin
    # is explicitly zeroed (disjoint from the DMA's destination rows in
    # exactly those blocks, so no write hazard).
    start_u = r * R - 2 * Dh
    g0 = pl.multiple_of(
        jnp.clip(r * R - Dh, 0, H - (R + 2 * Dh)), 8
    )
    s0 = pl.multiple_of(g0 - start_u, 8)

    C = scratch.shape[0]

    @pl.when(r == 0)
    def _():
        scratch[:, Dh : 2 * Dh, :] = jnp.zeros(
            (C, Dh, W), scratch.dtype
        )

    @pl.when(r == nR - 1)
    def _():
        scratch[:, R + 2 * Dh : R + 3 * Dh, :] = jnp.zeros(
            (C, Dh, W), scratch.dtype
        )

    dma = pltpu.make_async_copy(
        u_hbm.at[b, :, pl.ds(g0, R + 2 * Dh), :],
        scratch.at[:, pl.ds(s0, R + 2 * Dh), :],
        sem,
    )
    dma.start()

    py = py_ref[:]  # (R, W)
    px = px_ref[:]
    gi = (
        r * R
        + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
    )
    gj = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    y0 = jnp.clip(jnp.floor(py), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(px), 0, W - 2).astype(jnp.int32)
    wy = (py - y0.astype(jnp.float32))[None]  # (1, R, W) broadcasts over ch
    wx = (px - x0.astype(jnp.float32))[None]
    oy = y0 - gi
    ox = x0 - gj

    dy_lo = bounds_ref[b, r, 0]
    dy_hi = bounds_ref[b, r, 1]
    dx_lo = bounds_ref[b, r, 2]
    dx_hi = bounds_ref[b, r, 3]

    dma.wait()

    o_ref[:] = jnp.zeros(o_ref.shape, o_ref.dtype)

    # rows of scratch: global row g = start_u + s ⇒ output row i at
    # offset d reads s = i + 2·Dh + d, realized as a DYNAMIC roll of the
    # stripe by (−d mod nrows) followed by a static 8-aligned slice at
    # 2·Dh (Mosaic rejects dynamic sublane slice starts but supports
    # dynamic rotate). The d loop covers [dy_lo, dy_hi+1] — the bilinear
    # row footprint of the measured offsets — instead of the worst-case
    # [−D, D]; the dx loop likewise covers [dx_lo, dx_hi] with a dynamic
    # initial lane roll advanced one lane per iteration (static −1 roll
    # carried, so only the first roll is dynamic).
    nrows = R + 4 * Dh
    n_d = dy_hi + 2 - dy_lo
    n_x = dx_hi + 1 - dx_lo

    def d_body(jd, _):
        d = dy_lo + jd
        cur = pltpu.roll(scratch[:], jnp.mod(-d, nrows), axis=1)
        Fd = cur[:, 2 * Dh : 2 * Dh + R, :]  # (2, R, W)

        prev0 = pltpu.roll(Fd, jnp.mod(-dx_lo, W), axis=2)

        # NOTE (r5): factoring the x gather through the lerp (accumulate
        # corner gathers A/B, lerp once per d) looks like fewer ops but
        # measured 27% SLOWER end-to-end (466.7 vs 366.1 ms per 8x1024²
        # composition, tools/bench_ff_gm.py) — the second live
        # accumulator doubles the loop-carried vector state and Mosaic
        # spills. The single-accumulator per-term lerp stays.
        def x_body(t, carry):
            g, prev = carry
            dx = dx_lo + t
            nxt = pltpu.roll(prev, W - 1, axis=2)
            selx = (ox == dx).astype(jnp.float32)[None]
            g = g + selx * ((1.0 - wx) * prev + wx * nxt)
            return g, nxt

        g, _ = jax.lax.fori_loop(
            0, n_x, x_body,
            (jnp.zeros(o_ref.shape, o_ref.dtype), prev0),
        )
        wrow = (
            (oy == d).astype(jnp.float32)[None] * (1.0 - wy)
            + (oy == d - 1).astype(jnp.float32)[None] * wy
        )
        o_ref[:] = o_ref[:] + wrow * g
        return 0

    jax.lax.fori_loop(0, n_d, d_body, 0)


@partial(jax.jit, static_argnames=("D", "interpret"))
def shift_sample_pallas(
    u: jnp.ndarray,
    py: jnp.ndarray,
    px: jnp.ndarray,
    D: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sample (B, C, H, W) ``u`` at float positions (B, H, W) whose floor
    offsets from each pixel lie in [-D, D-1] (displacement bound D-1).
    Returns (B, C, H, W) float32. Work is sized by the measured
    per-stripe offset ranges; results are exact for any content within
    the static bound. C is small (1-4: flow fields, label maps)."""
    B, C, H, W = u.shape
    assert 1 <= C <= 4, u.shape
    Dh = -(-D // 8) * 8  # halo rounded to the f32 sublane tile
    R = _pick_row_block(H, W, Dh, C)
    assert R is not None, (H, W, D)

    u = u.astype(jnp.float32)
    py = py.astype(jnp.float32)
    px = px.astype(jnp.float32)
    bounds = _stripe_bounds(py, px, H, W, R, D)

    return pl.pallas_call(
        partial(_sample_kernel, D=D, Dh=Dh, R=R, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (B, nR, 4) bounds
            pl.BlockSpec((None, R, W), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, R, W), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # whole field stays in HBM
        ],
        out_specs=pl.BlockSpec((None, C, R, W), lambda b, r: (b, 0, r, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C, R + 4 * Dh, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(R, W, Dh, C),
        ),
        interpret=interpret,
    )(bounds, py, px, u)


def _stripe_bounds_int(fy, fx, H, W, R, D):
    """Per-(batch, output-stripe) ranges of the REVERSE offsets d = i − q
    for integer targets q = (fy, fx) of sources i, plus the guard scalar.

    A source at i lands on q = i + off with off = (fy−i_y, fx−i_x); the
    output-stripe loop iterates d = −off over sources reachable from the
    stripe, so the per-source forward ranges are window-combined over the
    stripes a ±D halo can touch and negated. Returns ((B, nR, 4) int32
    bounds, (B,) bool within-bound guard)."""
    B = fy.shape[0]
    nR = H // R
    gi = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)[None]
    gj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)[None]
    oy = fy - gi
    ox = fx - gj
    ok = (jnp.max(jnp.abs(oy), axis=(1, 2)) <= D - 1) & (
        jnp.max(jnp.abs(ox), axis=(1, 2)) <= D - 1
    )
    oy = jnp.clip(oy, -D, D).reshape(B, nR, R * W)
    ox = jnp.clip(ox, -D, D).reshape(B, nR, R * W)
    f_lo_y = oy.min(axis=2)  # (B, nR) forward per-source-stripe ranges
    f_hi_y = oy.max(axis=2)
    f_lo_x = ox.min(axis=2)
    f_hi_x = ox.max(axis=2)

    # combine over the source stripes that actually REACH each output
    # stripe. The r5-era version unioned over every stripe within
    # ±ceil(D/R) — at R=16/D=64 that is ±4 stripes regardless of
    # content, which re-widened the ranges the small stripes had just
    # tightened. Source stripe s deposits into output rows
    # [s·R + f_lo_y[s], (s+1)·R − 1 + f_hi_y[s]]; masking the union by
    # that interval keeps every needed offset (the bounds stay a
    # superset of the true per-output-stripe ranges, so the kernel's
    # skipped terms are exactly the all-zero selects) while stripes
    # whose content never lands in r no longer widen r's loops.
    big = jnp.int32(D)
    s_idx = jnp.arange(nR, dtype=jnp.int32)
    lo_stripe = (s_idx[None, :] * R + f_lo_y) // R          # (B, nR)
    hi_stripe = (s_idx[None, :] * R + R - 1 + f_hi_y) // R
    r_idx = jnp.arange(nR, dtype=jnp.int32)
    contrib = (
        (lo_stripe[:, :, None] <= r_idx[None, None, :])
        & (r_idx[None, None, :] <= hi_stripe[:, :, None])
    )  # (B, nR_src, nR_out)

    def cmin(a):
        return jnp.min(
            jnp.where(contrib, a[:, :, None], big), axis=1
        )

    def cmax(a):
        return jnp.max(
            jnp.where(contrib, a[:, :, None], -big), axis=1
        )

    bounds = jnp.stack(
        [-cmax(f_hi_y), -cmin(f_lo_y), -cmax(f_hi_x), -cmin(f_lo_x)],
        axis=2,
    )  # (B, nR, 4): d ranges [lo, hi] per axis; un-reached output
    # stripes get an empty [D, -D] range (zero kernel iterations)
    return bounds, ok


def _count_kernel(bounds_ref, u_hbm, o_ref, scratch, sem, *, D, Dh, R, H,
                  W):
    """out[q] = Σ_{d} [fy[q+d] == q_y]·[fx[q+d] == q_x]·cell[q+d] — the
    transpose of :func:`_sample_kernel`: a bounded-displacement
    scatter-ADD (histogram of integer landing positions) computed
    gather/scatter-free as one-hot accumulation over rolled stripes.
    ``u_hbm`` stacks (fy, fx, cell) as 3 f32 channels. Margin rows are
    zeroed like the sampler's; their cell channel is 0 so they can never
    contribute a count (fy=fx=0 alone would otherwise spuriously match
    output pixel (0,0))."""
    b = pl.program_id(0)
    r = pl.program_id(1)
    nR = pl.num_programs(1)

    start_u = r * R - 2 * Dh
    g0 = pl.multiple_of(
        jnp.clip(r * R - Dh, 0, H - (R + 2 * Dh)), 8
    )
    s0 = pl.multiple_of(g0 - start_u, 8)

    @pl.when(r == 0)
    def _():
        scratch[:, Dh : 2 * Dh, :] = jnp.zeros((3, Dh, W), scratch.dtype)

    @pl.when(r == nR - 1)
    def _():
        scratch[:, R + 2 * Dh : R + 3 * Dh, :] = jnp.zeros(
            (3, Dh, W), scratch.dtype
        )

    dma = pltpu.make_async_copy(
        u_hbm.at[b, :, pl.ds(g0, R + 2 * Dh), :],
        scratch.at[:, pl.ds(s0, R + 2 * Dh), :],
        sem,
    )
    dma.start()

    gi = (
        r * R + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
    ).astype(jnp.float32)
    gj = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1).astype(
        jnp.float32
    )

    dy_lo = bounds_ref[b, r, 0]
    dy_hi = bounds_ref[b, r, 1]
    dx_lo = bounds_ref[b, r, 2]
    dx_hi = bounds_ref[b, r, 3]

    dma.wait()

    nrows = R + 4 * Dh
    n_d = dy_hi + 1 - dy_lo
    n_x = dx_hi + 1 - dx_lo

    def d_body(jd, acc):
        d = dy_lo + jd
        cur = pltpu.roll(scratch[:], jnp.mod(-d, nrows), axis=1)
        Fd = cur[:, 2 * Dh : 2 * Dh + R, :]  # (3, R, W)

        prev0 = pltpu.roll(Fd, jnp.mod(-dx_lo, W), axis=2)

        def x_body(t, carry):
            g, prev = carry
            # prev = (fy, fx, cell) sampled at q + (d, dx_lo + t)
            sel = (
                (prev[0] == gi).astype(jnp.float32)
                * (prev[1] == gj).astype(jnp.float32)
                * prev[2]
            )
            nxt = pltpu.roll(prev, W - 1, axis=2)
            return g + sel, nxt

        g, _ = jax.lax.fori_loop(
            0, n_x, x_body,
            (jnp.zeros((R, W), jnp.float32), prev0),
        )
        return acc + g

    o_ref[:] = jax.lax.fori_loop(
        0, n_d, d_body, jnp.zeros((R, W), jnp.float32)
    )


@partial(jax.jit, static_argnames=("D", "interpret"))
def scatter_count_pallas(
    fy: jnp.ndarray,
    fx: jnp.ndarray,
    cell: jnp.ndarray,
    D: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Histogram of integer landing positions with |displacement| < D:
    ``out[b, y, x] = Σ_i cell[b, i] · [fy[b, i] == y] · [fx[b, i] == x]``
    — exactly ``zeros.at[fy·W+fx].add(cell)`` (bit-exact: counts are
    small-integer f32 sums) but with no serialized XLA scatter. fy/fx
    int32 in [0, H) × [0, W); caller must guard displacements ≥ D (see
    :func:`_stripe_bounds_int`'s ``ok``)."""
    B, H, W = fy.shape
    Dh = -(-D // 8) * 8
    R = _pick_row_block(H, W, Dh, 3)
    assert R is not None, (H, W, D)

    bounds, _ = _stripe_bounds_int(fy, fx, H, W, R, D)
    u = jnp.stack(
        [fy.astype(jnp.float32), fx.astype(jnp.float32),
         cell.astype(jnp.float32)],
        axis=1,
    )  # (B, 3, H, W)

    return pl.pallas_call(
        partial(_count_kernel, D=D, Dh=Dh, R=R, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (B, nR, 4) bounds
            pl.BlockSpec(memory_space=pltpu.HBM),   # stacked maps
        ],
        out_specs=pl.BlockSpec((None, R, W), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, R + 4 * Dh, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(R, W, Dh, C=3),
        ),
        interpret=interpret,
    )(bounds, u)
