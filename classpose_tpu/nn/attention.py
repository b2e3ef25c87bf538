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
    rh = rh_ref[0]  # (L, H)
    rw = rw_ref[0]  # (L, W)

    s = jax.lax.dot_general(
        q, k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (L, L)

    # key j ↔ 2D (h_j, w_j) = (j // W, j % W):
    #   bias_h[i, j] = rh[i, j // W] — an elementwise column repeat, which
    #   Mosaic can't reshape/jnp.repeat into; build it as a tiny one-hot
    #   expansion matmul rh @ E with E[h, j] = (j // W == h) (MXU-cheap:
    #   (L,H)x(H,L), ~25% of the qk matmul's FLOPs). The dot runs in the
    #   input dtype with f32 accumulation — E is exactly 0/1 so each
    #   output is a pure selection, bit-identical to an fp32 dot but
    #   without the multi-pass fp32-MXU penalty.
    #   bias_w[i, j] = rw[i, j % W] — whole-block tiling, which IS
    #   pltpu.repeat's semantics (its impl concatenates copies).
    L, W = rw.shape
    Hh = rh.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hh, L), 0)
    cols_h = jax.lax.broadcasted_iota(jnp.int32, (Hh, L), 1) // W
    expand = (rows == cols_h).astype(rh.dtype)
    bias_h = jax.lax.dot(rh, expand, preferred_element_type=jnp.float32)
    bias_w = pltpu.repeat(rw, L // W, axis=1).astype(jnp.float32)
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


def _attn_kernel_blc(q_ref, k_ref, v_ref, rel_ref, o_ref, *, scale, hd,
                     grid_h, grid_w, fused_bias=0):
    """Attention for a PAIR of heads whose q/k/v live side by side in one
    128-lane block sliced straight out of the (B, L, 3C) qkv tensor — the
    layout the qkv Dense naturally produces (a free reshape of
    (B, H, W, 3C)). The former kernel wanted (B·n, L, hd) inputs, which
    cost ~270 ms/batch of XLA transposes per ViT forward just to feed it
    (ROADMAP r2 profile); here the BlockSpec index maps do the slicing in
    the DMA and no relayout ever materializes in HBM. Mosaic requires
    128-divisible last block dims, hence the head pairing (2·hd = 128).
    Per-head math is identical to :func:`_attn_kernel`.

    ``fused_bias`` (CLASSPOSE_ATTN_V2=1) restructures the pre-softmax
    stage into ONE full-depth matmul: s = [q·scale | rh | rw] @
    [k | onehot(j//W) | onehot(j%W)]ᵀ. The plain QK dot contracts only
    hd=64 of the MXU's 128-deep systolic array (50% utilization); padding
    the contraction with the bias terms brings it to 128 at zero extra
    MXU time and deletes the separate expand dot (K=32), the
    ``pltpu.repeat`` tiling, and both L×L VPU bias adds. hd=64 makes
    scale=2⁻³ an exact power of two, so pre-scaling q in bf16 is a pure
    exponent shift and the qk part of the accumulation is bit-identical
    to the post-scaled fp32 dot; the bias columns are 0/1 selections.
    It also defers softmax normalization past the AV matmul: dividing
    the (L, hd) output by the row sums replaces dividing the (L, L)
    probability matrix — L/hd = 16x less VPU division work.

    ``fused_bias=2`` ("onesum", CLASSPOSE_ATTN_V2=2) additionally moves
    the softmax row-sum onto the MXU: the AV matmul's output tile is 128
    lanes wide but v is only hd=64 — the other 64 lanes are padding the
    systolic array computes for free. Multiplying p against [v | 1]
    makes those lanes accumulate the row sums, deleting the VPU
    cross-lane sum-reduce pass entirely (tools/attn_v3.py: 4.86 vs
    5.28 ms/layer on the 100-crop batch, max|Δ| 3e-5 — the denominator
    now sums the same bf16-rounded p the numerator uses, which is if
    anything more self-consistent than the fp32 VPU sum)."""
    L = q_ref.shape[0]
    pair = q_ref.shape[1] // hd
    rel_step = rel_ref.shape[1] // pair  # = grid_h + grid_w per head
    for h in range(pair):
        q = q_ref[:, h * hd:(h + 1) * hd]  # (L, hd)
        k = k_ref[:, h * hd:(h + 1) * hd]
        v = v_ref[:, h * hd:(h + 1) * hd]
        rh = rel_ref[:, h * rel_step:h * rel_step + grid_h]  # (L, H)
        rw = rel_ref[:, h * rel_step + grid_h:(h + 1) * rel_step]  # (L, W)

        if fused_bias:
            # key j ↔ (h_j, w_j) = (j // W, j % W); the one-hot selector
            # columns make the single dot accumulate
            # scale·q_i·k_j + rh[i, h_j] + rw[i, w_j] in one fp32 chain
            jj_h = jax.lax.broadcasted_iota(jnp.int32, (L, grid_h), 0) \
                // grid_w
            th = jax.lax.broadcasted_iota(jnp.int32, (L, grid_h), 1)
            eh = (jj_h == th).astype(k.dtype)  # (L, H)
            jj_w = jax.lax.broadcasted_iota(jnp.int32, (L, grid_w), 0) \
                % grid_w
            tw = jax.lax.broadcasted_iota(jnp.int32, (L, grid_w), 1)
            ew = (jj_w == tw).astype(k.dtype)  # (L, W)
            qx = jnp.concatenate(
                [(q.astype(jnp.float32) * scale).astype(q.dtype), rh, rw],
                axis=1,
            )  # (L, hd+H+W)
            kx = jnp.concatenate([k, eh, ew], axis=1)
            s = jax.lax.dot_general(
                qx, kx,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (L, L)
            m = jnp.max(s, axis=1, keepdims=True)
            p32 = jnp.exp(s - m)
            if fused_bias == 2 and hd < 128:
                vx = jnp.concatenate(
                    [v, jnp.ones((L, 128 - hd), v.dtype)], axis=1)
                oe = jax.lax.dot(p32.astype(v.dtype), vx,
                                 preferred_element_type=jnp.float32)
                denom = oe[:, hd:hd + 1]
                o_ref[:, h * hd:(h + 1) * hd] = (
                    oe[:, :hd] / denom).astype(o_ref.dtype)
                continue
            denom = jnp.sum(p32, axis=1, keepdims=True)
            o = jax.lax.dot(p32.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            o_ref[:, h * hd:(h + 1) * hd] = (o / denom).astype(o_ref.dtype)
            continue

        s = jax.lax.dot_general(
            q, k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (L, L)

        # bias expand dot in the INPUT dtype with f32 accumulation: the
        # expand matrix is exactly 0/1, so every output element is a
        # plain selection of an rh value — bit-identical to the fp32
        # dot, but ~4-8x faster (fp32 MXU matmuls decompose into
        # multiple bf16 passes on v5e)
        rows = jax.lax.broadcasted_iota(jnp.int32, (grid_h, L), 0)
        cols_h = jax.lax.broadcasted_iota(jnp.int32, (grid_h, L), 1) \
            // grid_w
        expand = (rows == cols_h).astype(rh.dtype)
        bias_h = jax.lax.dot(rh, expand,
                             preferred_element_type=jnp.float32)
        bias_w = pltpu.repeat(rw, L // grid_w, axis=1).astype(
            jnp.float32)
        s = s + bias_h + bias_w

        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        p = (p / denom).astype(v.dtype)
        o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[:, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)


def flash_attention_relpos_blc(
    qkv: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray | None,
    scale: float,
    grid_hw: tuple[int, int] = (32, 32),
    interpret: bool = False,
    num_heads: int | None = None,
    fused_bias: bool | int | None = None,
) -> jnp.ndarray:
    """Env-resolving wrapper: ``fused_bias=None`` reads CLASSPOSE_ATTN_V2.
    Variants: 0 = split-bias kernel, 1 = fused-bias (one full-depth QK
    dot + deferred softmax normalization), 2 = fused-bias + MXU row-sum
    ("onesum": the AV matmul's free padding lanes accumulate the softmax
    denominator). Measured on v5e (tools/attn_micro.py r3,
    tools/attn_v3.py r4): 10.48 / 7.20-5.28 / 4.86 ms/layer over the
    100-crop batch; max|Δ| of 1 vs 0 is 6e-5, of 2 vs 1 is 3e-5 (bf16
    rounding of the accumulation chains). Default 2. A/B harnesses pass
    an explicit value to interleave variants in one process.

    ``rel_w=None`` means ``rel_h`` is already the per-head concatenated
    bias projection (B, L, n, H+W) — produced by the single-table rel
    einsum — and the kernel-feeding concat is skipped entirely."""
    if fused_bias is None:
        import os

        fused_bias = int(os.environ.get("CLASSPOSE_ATTN_V2", "2"))
    return _flash_attention_relpos_blc(
        qkv, rel_h, rel_w, scale, grid_hw=grid_hw, interpret=interpret,
        num_heads=num_heads, fused_bias=int(fused_bias),
    )


def _attn_core_ref(qkv, rel, scale, grid_hw, n):
    """Pure-XLA math of the blc kernel on the SAME operand layouts
    (qkv (B, L, 3·n·hd), rel (B, L, n, H+W)) — the differentiable
    reference used by the kernel's custom_vjp backward."""
    B, L, C3 = qkv.shape
    hd = C3 // (3 * n)
    H, W = grid_hw
    q = qkv[..., : n * hd].reshape(B, L, n, hd)
    k = qkv[..., n * hd : 2 * n * hd].reshape(B, L, n, hd)
    v = qkv[..., 2 * n * hd :].reshape(B, L, n, hd)
    q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))  # (B, n, L, hd)
    rh = jnp.swapaxes(rel[..., :H], 1, 2)  # (B, n, L, H)
    rw = jnp.swapaxes(rel[..., H:], 1, 2)  # (B, n, L, W)
    out = attention_reference(q, k, v, rh, rw, scale)  # (B, n, L, hd)
    return jnp.swapaxes(out, 1, 2).reshape(B, L, n * hd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _attn_core(qkv, rel, scale, grid_hw, num_heads, fused_bias,
               interpret):
    """Differentiable wrapper: Pallas forward, XLA-reference backward.

    pallas_call has no autodiff rule, which made the bf16 TPU TRAINING
    path fail at jax.grad (tools/bench_train.py caught it in r4). The
    backward here recomputes attention with the plain-XLA math on the
    saved (qkv, rel) operands and pulls the cotangent through jax.vjp —
    the same L×L materialization the reference's torch SDPA-with-attn-
    mask backward performs, so training memory matches expectations
    while inference keeps the zero-HBM-intermediate kernel."""
    return _attn_pallas(qkv, rel, scale, grid_hw, num_heads, fused_bias,
                        interpret)


def _attn_core_fwd(qkv, rel, scale, grid_hw, num_heads, fused_bias,
                   interpret):
    out = _attn_pallas(qkv, rel, scale, grid_hw, num_heads, fused_bias,
                       interpret)
    return out, (qkv, rel)


def _attn_core_bwd(scale, grid_hw, num_heads, fused_bias, interpret,
                   res, g):
    qkv, rel = res
    import os as _os

    mode = _os.environ.get("CLASSPOSE_ATTN_BWD")
    use_pallas = (
        mode == "pallas"
        or (mode is None and (
            interpret or jax.default_backend() == "tpu"
        ))
    )
    if use_pallas:
        return _attn_bwd_pallas(
            qkv, rel, g.reshape(qkv.shape[0], qkv.shape[1], -1),
            scale, grid_hw, num_heads, interpret,
        )
    _, vjp = jax.vjp(
        lambda a, r: _attn_core_ref(a, r, scale, grid_hw, num_heads),
        qkv, rel,
    )
    return vjp(g.reshape(qkv.shape[0], qkv.shape[1], -1))


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)


@partial(jax.jit, static_argnames=("scale", "grid_hw", "interpret",
                                   "num_heads", "fused_bias"))
def _flash_attention_relpos_blc(
    qkv: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray | None,
    scale: float,
    grid_hw: tuple[int, int] = (32, 32),
    interpret: bool = False,
    num_heads: int | None = None,
    fused_bias: int = 0,
) -> jnp.ndarray:
    """Attention in the token-major layout: qkv (B, L, 3·n·hd) exactly as
    the qkv projection emits it (pass ``num_heads``; a 5-D
    (B, L, 3, n, hd) input is also accepted for compatibility — but the
    3-D form is the fast path: materializing the 5-D shape costs a full
    ~3 ms/layer relayout at production size because its (n, hd) minor
    dims retile the 630 MB tensor), rel_h (B, L, n, H),
    rel_w (B, L, n, W). Returns (B, L, n, hd) — a free reshape away from
    the (B, H, W, C) input of the output projection. Same math as
    :func:`flash_attention_relpos` (shared kernel body); heads are
    processed in pairs so every HBM block slice is 128 lanes wide."""
    if qkv.ndim == 5:
        B, L, three, n, hd = qkv.shape
        assert three == 3
        qkv = qkv.reshape(B, L, 3 * n * hd)
    else:
        B, L, C3 = qkv.shape
        n = num_heads if num_heads is not None else rel_h.shape[2]
        hd = C3 // (3 * n)
    H, W = grid_hw
    assert L == H * W, (L, H, W)

    # rel layout: per head [rel_h | rel_w] (H+W wide), heads consecutive —
    # a pair block is pair·(H+W) wide (=128 for the SAM 32×32 grid).
    # With rel_w=None the caller already produced that layout (one
    # concatenated-table einsum) and the concat here — whose relayout
    # copies cost ~2 ms/layer at production size — is skipped.
    if rel_w is None:
        assert rel_h.shape[-1] == H + W, rel_h.shape
        rel = rel_h
    else:
        rel = jnp.concatenate([rel_h, rel_w], axis=-1)

    out = _attn_core(qkv, rel, scale, (H, W), n, fused_bias, interpret)
    return out.reshape(B, L, n, hd)


def _attn_pallas(qkv, rel, scale, grid_hw, num_heads, fused_bias,
                 interpret):
    """The pallas_call itself: qkv (B, L, 3·n·hd), rel (B, L, n, H+W)."""
    B, L, C3 = qkv.shape
    n = num_heads
    hd = C3 // (3 * n)
    H, W = grid_hw
    pair = max(1, 128 // hd)
    # wider head blocks (CLASSPOSE_ATTN_PAIR=4/8) process more heads per
    # grid cell: fewer pipeline bubbles and more independent MXU/VPU
    # chains for Mosaic to overlap, at the cost of more VMEM — A/B'd on
    # hardware via tools/attn_micro.py before changing the default
    import os as _os

    _p = _os.environ.get("CLASSPOSE_ATTN_PAIR")
    if _p and int(_p) >= pair and n % int(_p) == 0:
        pair = int(_p)
    assert n % pair == 0 and (hd * pair) % 128 == 0, (n, hd)
    np_blk = n // pair          # number of head-pair blocks
    bw = hd * pair              # qkv block width (128 for hd=64)
    nh = (n * hd) // bw         # blocks per q/k/v section
    rel = rel.reshape(B, L, n * (H + W))
    rw_blk = pair * (H + W)

    return pl.pallas_call(
        partial(_attn_kernel_blc, scale=scale, hd=hd, grid_h=H, grid_w=W,
                fused_bias=fused_bias),
        out_shape=jax.ShapeDtypeStruct((B, L, n * hd), qkv.dtype),
        grid=(B, np_blk),
        in_specs=[
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, nh + p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, 2 * nh + p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, rw_blk), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, p),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # wider head blocks scale the kernel's stack (scores/bias
            # tiles per head) past Mosaic's default 16 MB scoped-VMEM
            # limit (pair=4 measured 18.7 MB); v5e has 128 MB VMEM, so
            # raise the per-kernel limit proportionally
            vmem_limit_bytes=(
                None if pair <= 2 else (pair // 2) * 16 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, rel)


def _attn_bwd_kernel_blc(q_ref, k_ref, v_ref, rel_ref, do_ref,
                         dq_ref, dk_ref, dv_ref, drel_ref, *,
                         scale, hd, grid_h, grid_w):
    """Flash-style attention backward for a pair of heads, recomputing
    the (L, L) probabilities in VMEM from the saved operands — the
    XLA-reference backward materializes logits AND probabilities in HBM
    per layer (~1 GB transient at the batch-16 train step), which made
    the ViT-L backward bandwidth-bound (~20% train MFU, VERDICT r4
    item 4 / r5 item 6).

    The fused-bias formulation gives the rel-pos grads for free: with
    s = [q·scale | rh | rw] @ [k | onehot_h | onehot_w]ᵀ, the single
    matmul dqx = ds @ kx emits [d(q·scale) | drh | drw] — the one-hot
    selector columns route each ds row-sum into its bias bucket, which
    is exactly the scatter the XLA backward does for the decomposed
    bias. dk similarly contracts dsᵀ against the scaled-q block only.
    """
    L = q_ref.shape[0]
    pair = q_ref.shape[1] // hd
    rel_step = rel_ref.shape[1] // pair
    for h in range(pair):
        q = q_ref[:, h * hd:(h + 1) * hd]
        k = k_ref[:, h * hd:(h + 1) * hd]
        v = v_ref[:, h * hd:(h + 1) * hd]
        rh = rel_ref[:, h * rel_step:h * rel_step + grid_h]
        rw = rel_ref[:, h * rel_step + grid_h:(h + 1) * rel_step]
        do = do_ref[:, h * hd:(h + 1) * hd]

        # ---- recompute p exactly as the fused forward does ----
        jj_h = jax.lax.broadcasted_iota(jnp.int32, (L, grid_h), 0) \
            // grid_w
        th = jax.lax.broadcasted_iota(jnp.int32, (L, grid_h), 1)
        eh = (jj_h == th).astype(k.dtype)
        jj_w = jax.lax.broadcasted_iota(jnp.int32, (L, grid_w), 0) \
            % grid_w
        tw = jax.lax.broadcasted_iota(jnp.int32, (L, grid_w), 1)
        ew = (jj_w == tw).astype(k.dtype)
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        qx = jnp.concatenate([qs, rh, rw], axis=1)   # (L, hd+H+W)
        kx = jnp.concatenate([k, eh, ew], axis=1)
        s = jax.lax.dot_general(
            qx, kx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=1, keepdims=True)
        p32 = jnp.exp(s - m)
        pn = p32 / jnp.sum(p32, axis=1, keepdims=True)  # (L, L) f32
        pb = pn.astype(v.dtype)

        # ---- grads ----
        # dv = pᵀ · do   (contract the query axis)
        dv = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dp = do · vᵀ
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # softmax backward: ds = p ∘ (dp − Σ_j p∘dp)
        delta = jnp.sum(pn * dp, axis=1, keepdims=True)
        ds = (pn * (dp - delta)).astype(k.dtype)     # (L, L)
        # dqx = ds · kx → [d(q·scale) | drh | drw] in one matmul
        dqx = jax.lax.dot_general(
            ds, kx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dk = dsᵀ · (q·scale)
        dk = jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        odt = dq_ref.dtype
        dq_ref[:, h * hd:(h + 1) * hd] = (
            dqx[:, :hd] * scale).astype(odt)
        dk_ref[:, h * hd:(h + 1) * hd] = dk.astype(odt)
        dv_ref[:, h * hd:(h + 1) * hd] = dv.astype(odt)
        drel_ref[:, h * rel_step:(h + 1) * rel_step] = (
            dqx[:, hd:hd + grid_h + grid_w].astype(drel_ref.dtype)
        )


def _attn_bwd_pallas(qkv, rel, do, scale, grid_hw, num_heads,
                     interpret):
    """Pallas backward: returns (dqkv, drel) matching the forward's
    operand shapes. Same grid/blocking as :func:`_attn_pallas`."""
    B, L, C3 = qkv.shape
    n = num_heads
    hd = C3 // (3 * n)
    H, W = grid_hw
    pair = max(1, 128 // hd)
    import os as _os

    _p = _os.environ.get("CLASSPOSE_ATTN_PAIR")
    if _p and int(_p) >= pair and n % int(_p) == 0:
        pair = int(_p)
    np_blk = n // pair
    bw = hd * pair
    nh = (n * hd) // bw
    rel_shape = rel.shape
    rel2 = rel.reshape(B, L, n * (H + W))
    rw_blk = pair * (H + W)

    dq, dk, dv, drel = pl.pallas_call(
        partial(_attn_bwd_kernel_blc, scale=scale, hd=hd, grid_h=H,
                grid_w=W),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, n * hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, L, n * hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, L, n * hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, L, n * (H + W)), rel.dtype),
        ),
        grid=(B, np_blk),
        in_specs=[
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, nh + p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, 2 * nh + p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, rw_blk), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, rw_blk), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=max(2, pair) * 24 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, rel2, do)

    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv, drel.reshape(rel_shape)


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
