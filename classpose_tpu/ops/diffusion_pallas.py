"""Pallas TPU kernel: batched masked heat diffusion (halo-k blocking).

The flow-QC recomputation (cellpose ``remove_bad_flow_masks`` semantics,
reference models.py:120-159) iterates a 9-point *instance-masked* mean
stencil 40–400 times over the full tile. XLA's lowering re-materializes
the shifted temporaries in HBM every iteration (~20 MB/iter/tile measured
on this chip), so the loop is bandwidth-bound. This kernel instead keeps a
``(block + 2k)²`` window VMEM-resident and runs ``k`` iterations per HBM
round trip:

- grid = (batch, blocks_y, blocks_x); each program DMAs its halo window of
  T / instance-ids / source map from HBM into VMEM scratch, iterates the
  stencil ``k`` times entirely in VMEM, and writes back only the exact
  ``block²`` interior (a k-step 3×3 stencil has dependence radius k, so
  the interior stays exact while the halo ring degrades);
- per-tile iteration counts (extent-derived, multiples of k) are honored
  by an ``active`` flag per batch element: finished tiles copy through,
  so a batch mixes horizons without changing any tile's result;
- HBM traffic drops from O(niter · H·W) to O(niter/k · H·W · overhead),
  with overhead = ((block+2k)/block)² ≈ 1.7 at block 256, k 40.

Semantics match :func:`classpose_tpu.dynamics.flows._diffuse_dyn` exactly
(same per-iteration source injection + same-instance neighbor mean; window
borders see id 0 outside the image, like the XLA path's zero padding).

**Status: correct but NOT wired into production.** Measured on the v5e
(4×1024², horizons 40–120): bit-exact vs the XLA path, but XLA already
fuses this stencil into an efficient loop (≈0.08 ms/iter/tile; the kernel
is ~2× slower at these horizons because the per-step window DMA overhead
is not amortized over enough iterations). The eval_batch QC cost that
motivated this kernel turned out to be host-side center-map preparation
plus host↔device transfer, which the fused batched program eliminates
(see runner/model.py). Kept, with an interpret-mode parity test, as the
halo-blocked design ROADMAP gap 4 called for — it becomes profitable only
at horizons ≫400 or if XLA's stencil fusion regresses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SHIFTS9 = [
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 0), (0, 1),
    (1, -1), (1, 0), (1, 1),
]


def _make_kernel(bs: int, k: int, ky: int, kx: int):
    # window: bs + 2*halo per dim; halos may exceed k (Mosaic requires the
    # lane dim 128-aligned and the sublane dim 8-aligned)
    My = bs + 2 * ky
    Mx = bs + 2 * kx

    def kernel(active_ref, t_hbm, ids_hbm, cen_hbm, out_ref,
               t_s, ids_s, cen_s, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        y0 = i * bs
        x0 = j * bs

        cp_t = pltpu.make_async_copy(
            t_hbm.at[b, pl.ds(y0, My), pl.ds(x0, Mx)], t_s, sems.at[0]
        )
        cp_i = pltpu.make_async_copy(
            ids_hbm.at[b, pl.ds(y0, My), pl.ds(x0, Mx)], ids_s, sems.at[1]
        )
        cp_c = pltpu.make_async_copy(
            cen_hbm.at[b, pl.ds(y0, My), pl.ds(x0, Mx)], cen_s, sems.at[2]
        )
        cp_t.start()
        cp_i.start()
        cp_c.start()
        cp_t.wait()
        cp_i.wait()
        cp_c.wait()

        ids = ids_s[:]
        fg = ids > 0
        cen = cen_s[:] * fg.astype(jnp.float32)
        T0 = t_s[:]

        def body(_, T):
            T = T + cen
            Tp = jnp.pad(T, 1)
            idsp = jnp.pad(ids, 1)
            acc = jnp.zeros((My, Mx), jnp.float32)
            for dy, dx in _SHIFTS9:
                nb_T = Tp[1 + dy : 1 + dy + My, 1 + dx : 1 + dx + Mx]
                nb_id = idsp[1 + dy : 1 + dy + My, 1 + dx : 1 + dx + Mx]
                acc = acc + jnp.where(nb_id == ids, nb_T, 0.0)
            return jnp.where(fg, acc / 9.0, 0.0)

        Tk = jax.lax.fori_loop(0, k, body, T0)
        # finished tiles copy through unchanged
        Tk = jnp.where(active_ref[b] > 0, Tk, T0)
        out_ref[:] = Tk[ky : ky + bs, kx : kx + bs][None]

    return kernel


@partial(jax.jit, static_argnames=("k", "bs", "interpret"))
def diffuse_pallas(
    T0: jnp.ndarray,
    ids: jnp.ndarray,
    center: jnp.ndarray,
    niters: jnp.ndarray,
    k: int = 40,
    bs: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched masked diffusion: (B, H, W) fields, per-batch ``niters``
    (each a multiple of ``k`` — the extent buckets are multiples of 40).
    Returns T after exactly ``niters[b]`` iterations per tile."""
    B, H, W = T0.shape
    nby = -(-H // bs)
    nbx = -(-W // bs)
    Py, Px = nby * bs, nbx * bs
    # Mosaic alignment: halo_y to the 8-sublane grid, halo_x to the
    # 128-lane grid; both must be >= k (stencil dependence radius)
    ky = -(-k // 8) * 8
    kx = -(-k // 128) * 128

    def pad_full(x, dtype):
        return jnp.pad(
            x.astype(dtype), ((0, 0), (ky, ky + Py - H), (kx, kx + Px - W))
        )

    ids_p = pad_full(ids, jnp.int32)
    cen_p = pad_full(center, jnp.float32)

    kernel = _make_kernel(bs, k, ky, kx)
    My = bs + 2 * ky
    Mx = bs + 2 * kx
    call = partial(
        pl.pallas_call,
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Py, Px), jnp.float32),
        grid=(B, nby, nbx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, bs, bs), lambda b, i, j: (b, i, j)),
        scratch_shapes=[
            pltpu.VMEM((My, Mx), jnp.float32),
            pltpu.VMEM((My, Mx), jnp.int32),
            pltpu.VMEM((My, Mx), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )

    max_steps = jnp.max(-(-niters // k))
    T_init = jnp.pad(
        T0.astype(jnp.float32), ((0, 0), (0, Py - H), (0, Px - W))
    )

    def step(s, T):
        active = (niters > s * k).astype(jnp.int32)
        Tp = jnp.pad(T, ((0, 0), (ky, ky), (kx, kx)))
        return call()(active, Tp, ids_p, cen_p)

    T = jax.lax.fori_loop(0, max_steps, step, T_init)
    return T[:, :H, :W]


# ---------------------------------------------------------------------
# Whole-tile VMEM-resident diffusion (r5).
#
# The r2 halo-blocked kernel above loses to XLA because it pays a window
# DMA every k iterations. At the production QC geometry (1024² tiles) the
# ENTIRE tile fits in VMEM (a v5e core has 128 MB), so this kernel DMAs
# nothing between iterations: ids/center/T stay resident and the 9
# neighbor-match masks — loop-invariant — are materialized once in
# scratch. The XLA stencil re-streams T + ids from HBM every iteration;
# here an iteration is 9 static rolls + FMAs over VMEM. Measured
# honestly (CLASSPOSE_PALLAS_DIFFUSION A/B in the fused QC): ~2 ms per
# 8×1024² batch at the production horizon ~80 — XLA's fused stencil was
# already cheap there, and the trace op that suggested ~67 ms was the
# histogram's conditional, not the diffusion. The kernel's margin grows
# with the horizon (it removes O(niter) HBM passes), so it stays the
# TPU default.
#
# Exactness: the accumulation reproduces _diffuse_dyn's term order
# (Σ over _SHIFTS9, /9.0, where(fg)); masks are exactly 0/1 f32 so
# mask·roll(T) equals the XLA path's where(nb_id==ids, nb_T, 0) — the
# wrapped rows/cols a roll introduces are zeroed through the mask's
# border-validity term, matching the zero-pad semantics (a pad-border
# neighbor contributes exactly 0.0 there too: either the id differs, or
# both ids are 0 and the padded T is 0).
# ---------------------------------------------------------------------

# per-tile VMEM footprint of the resident kernel (f32 planes): 8 masks +
# ids + center + fg + T carry + acc/roll temps ≈ 14 planes
_RESIDENT_PLANES = 15
_RESIDENT_VMEM_LIMIT = 100 * 1024 * 1024


def resident_diffusion_supported(H: int, W: int) -> bool:
    """Whole-tile residency gate: the kernel keeps ~15 f32 (H, W) planes
    in VMEM, so it supports exactly the geometries where that fits."""
    return (
        H % 8 == 0
        and W % 128 == 0
        and _RESIDENT_PLANES * H * W * 4 <= _RESIDENT_VMEM_LIMIT
    )


def _resident_kernel(niter_ref, ids_ref, cen_ref, o_ref, masks, *, H, W):
    ids = ids_ref[...]
    fg = ids > 0
    cen = cen_ref[...] * fg.astype(jnp.float32)

    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def rolled(x, dy, dx):
        r = x
        if dy:
            r = pltpu.roll(r, (-dy) % H, axis=0)
        if dx:
            r = pltpu.roll(r, (-dx) % W, axis=1)
        return r

    # loop-invariant neighbor-match masks (the center shift (0,0) always
    # matches itself — no mask needed). Border validity mirrors the XLA
    # path's zero padding: a neighbor outside the image never matches.
    k = 0
    for dy, dx in _SHIFTS9:
        if dy == 0 and dx == 0:
            continue
        nb_id = rolled(ids, dy, dx)
        valid = (
            (iy + dy >= 0) & (iy + dy < H) & (ix + dx >= 0) & (ix + dx < W)
        )
        masks[k] = ((nb_id == ids) & valid).astype(jnp.float32)
        k += 1

    fgf = fg
    niter = niter_ref[0, 0]

    def body(_, T):
        T = T + cen
        acc = jnp.zeros((H, W), jnp.float32)
        k = 0
        for dy, dx in _SHIFTS9:
            if dy == 0 and dx == 0:
                acc = acc + T
            else:
                acc = acc + masks[k] * rolled(T, dy, dx)
                k += 1
        return jnp.where(fgf, acc / 9.0, 0.0)

    o_ref[...] = jax.lax.fori_loop(
        0, niter, body, jnp.zeros((H, W), jnp.float32)
    )


@partial(jax.jit, static_argnames=("interpret",))
def diffuse_resident_pallas(
    ids: jnp.ndarray,
    center: jnp.ndarray,
    niter: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked heat diffusion with the whole tile VMEM-resident.

    Args: ids (H, W) int32 instance labels; center (H, W) f32 source
    map; niter () int32 iteration count (may be traced). Returns T
    (H, W) f32 after exactly ``niter`` iterations — bit-identical to
    ``_diffuse_dyn(ids, center, niter)``. Unbatched by design: the QC
    calls it under ``jax.vmap``, whose pallas batching rule turns the
    batch into a grid dimension (per-tile ``niter`` rides along as a
    batched SMEM scalar — pinned by
    tests/test_diffusion_resident.py::test_vmap_batching).
    """
    H, W = ids.shape
    assert resident_diffusion_supported(H, W), (H, W)
    return pl.pallas_call(
        partial(_resident_kernel, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[
            # (1, 1) niter — 2-D so the Mosaic block-shape check passes
            # when vmap batches it ((B, 1, 1) with block (None, 1, 1):
            # trailing dims equal the array's; the 1-D form was rejected)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, H, W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_RESIDENT_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(jnp.reshape(niter, (1, 1)).astype(jnp.int32),
      ids.astype(jnp.int32), center.astype(jnp.float32))


def pallas_diffusion_available() -> bool:
    """True when the compiled kernel can run (TPU backend)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
