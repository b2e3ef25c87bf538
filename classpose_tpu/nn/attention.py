"""Pallas TPU attention kernel with SAM decomposed relative-position bias.

The ViT-L encoder attends over L = (bsize/ps)² = 1024 tokens. The XLA path
materializes the (B, heads, L, L) logits plus two broadcast bias tensors in
HBM — ~25 GB of traffic per batch-8 forward across 24 layers, which makes
the network HBM-bound (~24 tiles/s/chip). At L=1024 and head_dim=64 an
entire per-(batch, head) attention instance fits in VMEM, so this kernel
computes softmax(q·kᵀ·scale + bias) @ v in one pass per (batch, head) grid
cell with zero HBM round-trips for the L×L intermediates.

The decomposed bias is built in-kernel from the precomputed projections
  rel_h (L, H): q_i · Rh[h_i, :]   and   rel_w (L, W): q_i · Rw[w_i, :]
as bias[i, j] = rel_h[i, j // W] + rel_w[i, j % W]
             = repeat(rel_h, W, axis=1) + tile(rel_w, H along axis 1),
which are cheap VPU ops on VMEM-resident tiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, scale,
                 grid_w):
    q = q_ref[0]  # (L, hd)
    k = k_ref[0]
    v = v_ref[0]
    rh = rh_ref[0].astype(jnp.float32)  # (L, H)
    rw = rw_ref[0].astype(jnp.float32)  # (L, W)

    s = jax.lax.dot_general(
        q, k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (L, L)

    # key j ↔ 2D (h_j, w_j) = (j // W, j % W):
    #   bias_h[i, j] = rh[i, j // W] — an elementwise column repeat, which
    #   Mosaic can't reshape/jnp.repeat into; build it as a tiny one-hot
    #   expansion matmul rh @ E with E[h, j] = (j // W == h) (MXU-cheap:
    #   (L,H)x(H,L), ~25% of the qk matmul's FLOPs).
    #   bias_w[i, j] = rw[i, j % W] — whole-block tiling, which IS
    #   pltpu.repeat's semantics (its impl concatenates copies).
    L, W = rw.shape
    Hh = rh.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hh, L), 0)
    cols_h = jax.lax.broadcasted_iota(jnp.int32, (Hh, L), 1) // W
    expand = (rows == cols_h).astype(jnp.float32)
    bias_h = jax.lax.dot(rh, expand, preferred_element_type=jnp.float32)
    bias_w = pltpu.repeat(rw, L // W, axis=1)
    s = s + bias_h + bias_w

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("scale", "grid_hw", "interpret"))
def flash_attention_relpos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray,
    scale: float,
    grid_hw: tuple[int, int] = (32, 32),
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention with decomposed rel-pos bias, VMEM-resident per (b, head).

    Args: q/k/v (B, n, L, hd); rel_h (B, n, L, H); rel_w (B, n, L, W) with
    L = H·W. Returns (B, n, L, hd) in q's dtype.
    """
    B, n, L, hd = q.shape
    H, W = grid_hw
    assert L == H * W, (L, H, W)
    BN = B * n

    def flat(x):
        return x.reshape(BN, *x.shape[2:])

    out = pl.pallas_call(
        partial(_attn_kernel, scale=scale, grid_w=W),
        out_shape=jax.ShapeDtypeStruct((BN, L, hd), q.dtype),
        grid=(BN,),
        in_specs=[
            pl.BlockSpec((1, L, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(flat(q), flat(k), flat(v), flat(rel_h), flat(rel_w))
    return out.reshape(B, n, L, hd)


def attention_reference(q, k, v, rel_h, rel_w, scale):
    """XLA reference for parity testing of the kernel."""
    B, n, L, hd = q.shape
    s = jnp.einsum("bnld,bnmd->bnlm", q, k,
                   preferred_element_type=jnp.float32) * scale
    H = rel_h.shape[-1]
    W = rel_w.shape[-1]
    bias = (
        rel_h.astype(jnp.float32)[..., :, None]
        + rel_w.astype(jnp.float32)[..., None, :]
    ).reshape(B, n, L, L)
    s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bnlm,bnmd->bnld", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
