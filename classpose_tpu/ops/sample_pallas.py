"""Pallas TPU kernel: gather-free bounded-displacement bilinear sampling.

follow_flows' binary flow-map composition is dominated by bilinear
resampling passes. XLA lowers per-pixel resampling to a serialized
~1M-index gather (~90 ms per pass at 1024²×4 on v5e); for passes whose
displacement bound is small, the sample can instead be computed as a
one-hot select over the (2D)² integer offsets — and doing that inside a
Pallas kernel over VMEM-resident row stripes turns every select term into
pure VPU work with zero extra HBM traffic (the XLA shift path in
dynamics/masks.py streams the field from HBM once per roll term).

Factored form (per output pixel exactly one (oy, ox) offset matches):

    G_d   = Σ_dx (ox == dx) · ((1−wx)·F_d[·, j+dx] + wx·F_d[·, j+dx+1])
    out   = Σ_d  ((oy == d)·(1−wy) + (oy == d−1)·wy) · G_d

with F_d the field rows at offset d, accessed through a DMA'd stripe with
D-row halos. Lane shifts are circular (pltpu.roll); wrapped values only
appear where the select mask is zero (positions are clipped to the image
interior before offsets are formed, exactly as dynamics/masks.py
``_shift_sample2`` does).

This evaluates the same four-corner bilinear formula as the XLA samplers
but in factored (two-level lerp) association order — not bitwise
identical to ``_bilinear2``'s flat four-term sum, which is fine: program
identity only matters WITHIN one compiled path (eval and eval_batch share
the sampler choice), not across backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_kernel(py_ref, px_ref, u_hbm, o_ref, scratch, sem, *, D, Dh,
                   R, H, W):
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
    # R, Dh and H are all multiples of 8, so g0/s0 are too — tell Mosaic
    g0 = pl.multiple_of(
        jnp.clip(r * R - Dh, 0, H - (R + 2 * Dh)), 8
    )
    s0 = pl.multiple_of(g0 - start_u, 8)  # copied rows' stripe offset

    @pl.when(r == 0)
    def _():
        scratch[:, Dh : 2 * Dh, :] = jnp.zeros(
            (2, Dh, W), scratch.dtype
        )

    @pl.when(r == nR - 1)
    def _():
        scratch[:, R + 2 * Dh : R + 3 * Dh, :] = jnp.zeros(
            (2, Dh, W), scratch.dtype
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

    dma.wait()

    o_ref[:] = jnp.zeros(o_ref.shape, o_ref.dtype)

    # rows of scratch: global row g = start_u + s ⇒ output row i at
    # offset d reads s = i + 2·Dh + d. The d loop is a fori_loop so only
    # one stripe view is live at a time (2D+1 unrolled static slices get
    # hoisted by Mosaic and blow the 16 MB VMEM stack at D ≥ 17), and
    # the per-d row offset is realized by CARRYING a vertically rolled
    # copy of the stripe — rolled by one more row each iteration (static
    # shift), then sliced at the static 8-aligned offset 2·Dh. Mosaic
    # rejects both unaligned and dynamic sublane slice starts, so this
    # rotate-and-slice is the lane/sublane-legal formulation.
    nrows = R + 4 * Dh
    cur0 = pltpu.roll(scratch[:], D % nrows, axis=1)  # d = -D view

    def d_body(j, cur):
        d = j - D
        Fd = cur[:, 2 * Dh : 2 * Dh + R, :]  # (2, R, W)
        g = jnp.zeros(o_ref.shape, o_ref.dtype)
        # pltpu.roll requires non-negative shifts; rolls are circular so
        # take them mod W
        prev = pltpu.roll(Fd, D % W, axis=2)  # dx = -D roll
        for dx in range(-D, D):
            nxt = pltpu.roll(Fd, (-(dx + 1)) % W, axis=2)
            selx = (ox == dx).astype(jnp.float32)[None]
            g = g + selx * ((1.0 - wx) * prev + wx * nxt)
            prev = nxt
        wrow = (
            (oy == d).astype(jnp.float32)[None] * (1.0 - wy)
            + (oy == d - 1).astype(jnp.float32)[None] * wy
        )
        o_ref[:] = o_ref[:] + wrow * g
        return pltpu.roll(cur, nrows - 1, axis=1)  # advance d by one row

    jax.lax.fori_loop(0, 2 * D + 1, d_body, cur0)


@partial(jax.jit, static_argnames=("D", "row_block", "interpret"))
def shift_sample_pallas(
    u: jnp.ndarray,
    py: jnp.ndarray,
    px: jnp.ndarray,
    D: int,
    row_block: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sample (B, 2, H, W) ``u`` at float positions (B, H, W) whose floor
    offsets from each pixel lie in [-D, D-1] (displacement bound D-1).
    Returns (B, 2, H, W) float32."""
    B, C, H, W = u.shape
    assert C == 2, u.shape
    Dh = -(-D // 8) * 8  # halo rounded to the f32 sublane tile
    if Dh > 24:
        row_block = min(row_block, 32)  # big halos: halve the live set
    R = min(row_block, H)
    assert H % R == 0 and R % 8 == 0 and H % 8 == 0, (H, R)
    assert H >= R + 2 * Dh, (H, R, D)

    u = u.astype(jnp.float32)
    py = py.astype(jnp.float32)
    px = px.astype(jnp.float32)

    return pl.pallas_call(
        partial(_sample_kernel, D=D, Dh=Dh, R=R, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((B, 2, H, W), jnp.float32),
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec((None, R, W), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, R, W), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # whole field stays in HBM
        ],
        out_specs=pl.BlockSpec((None, 2, R, W), lambda b, r: (b, 0, r, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, R + 4 * Dh, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(py, px, u)
