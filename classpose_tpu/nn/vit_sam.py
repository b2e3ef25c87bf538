"""ClassTransformer: ViT-L SAM image encoder with flow-field and semantic
class heads, in JAX/flax.

TPU-first rebuild of the capability defined by the reference
(/root/reference/src/classpose/vit_sam.py:81-197 and the cellpose
``vit_sam.Transformer`` base class it extends):

- patch embed: conv ps×ps stride ps (ps=8) on a 256² crop → 32×32 tokens of
  width 1024 (ViT-L), plus an absolute positional embedding;
- 24 transformer blocks with *global* (windowless) attention using the SAM
  decomposed relative-position bias (reference flash_forward,
  vit_sam.py:15-65);
- neck: 1×1 conv → LayerNorm2d → 3×3 conv → LayerNorm2d down to 256 ch;
- ``out`` head: 1×1 conv to 3·ps² channels, then a *fixed identity*
  pixel-shuffle readout to full resolution (the reference materializes this
  as a frozen conv_transpose weight W2; here it is a free reshape —
  mathematically identical, zero FLOPs);
- ``out_class`` head (n_cell_classes>1): 1×1 conv or a small UNet to
  n_classes·ps² channels, pixel-shuffled via the frozen identity W3
  (vit_sam.py:139-144,182-195);
- output is ``concat((class_logits, seg_out), channel)`` of shape
  (B, n_classes+3, H, W), plus a 256-d style vector. The reference's style
  is literally random noise kept for API compatibility (vit_sam.py:197);
  here it is zeros (deterministic, and equally meaningless downstream).
- training-time random layer-drop with a per-sample Bernoulli mask ramping
  linearly 0→rdrop over depth (vit_sam.py:165-173).

All compute is NHWC internally (TPU-native); the public call contract takes
and returns NCHW to match the reference network contract.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from classpose_tpu.nn.unet import UNet


@dataclasses.dataclass(frozen=True)
class ClassTransformerConfig:
    """Architecture hyperparameters (ViT-L SAM defaults used by cellpose)."""

    backbone: str = "vit_l"
    ps: int = 8
    nout: int = 3
    bsize: int = 256
    rdrop: float = 0.4
    n_cell_classes: int = 1
    feature_transformation_structure: Sequence[int] | None = None
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    neck_dim: int = 256
    dtype: str = "float32"  # compute dtype; params are always fp32
    # VMEM-resident Pallas rel-pos attention on TPU bf16 (nn/attention.py);
    # False falls back to the plain-XLA einsum path (same math)
    use_pallas_attention: bool = True

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def tokens_hw(self) -> int:
        return self.bsize // self.ps


def _interp_rel_pos(rel_pos: jnp.ndarray, max_rel_dist: int) -> jnp.ndarray:
    """Linearly resize a decomposed rel-pos table to ``max_rel_dist`` rows
    (identity when it already has that many)."""
    rel_pos = jnp.asarray(rel_pos)  # loaded checkpoints may hold numpy
    if rel_pos.shape[0] != max_rel_dist:
        # linear interpolation along the positions axis
        x_old = jnp.linspace(0.0, 1.0, rel_pos.shape[0])
        x_new = jnp.linspace(0.0, 1.0, max_rel_dist)
        idx = jnp.searchsorted(x_old, x_new, side="right") - 1
        idx = jnp.clip(idx, 0, rel_pos.shape[0] - 2)
        t = (x_new - x_old[idx]) / (x_old[idx + 1] - x_old[idx])
        rel_pos = rel_pos[idx] * (1 - t)[:, None] + rel_pos[idx + 1] * t[:, None]
    return rel_pos


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Select (and if needed linearly resize) relative positional embeddings.

    Equivalent to segment-anything's ``get_rel_pos`` used by the reference at
    vit_sam.py:40-41: returns (q_size, k_size, head_dim) where entry (i, j)
    is ``rel_pos[i - j + k_size - 1]`` (after optional interpolation to
    2·max(q,k)−1 entries).
    """
    rel_pos = _interp_rel_pos(rel_pos, 2 * max(q_size, k_size) - 1)
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def rel_bias_matmul(q_tok, rel_pos_h, rel_pos_w, H: int, W: int):
    """SAM decomposed rel-pos bias as ONE plain matmul + static slices.

    Emits the per-head concatenated bias (B, L, n, H+W) that
    ``flash_attention_relpos_blc`` consumes (identical element math to
    the per-token-table "cat" einsum; reference vit_sam.py:15-65):
    ``rel[b,i,n,j] = q_i · T_h[h_i - j + H - 1]`` (resp. ``T_w`` over w).

    Why: formulations that expand the table per token carry the token
    index l as a batch dim of the einsum's table operand, which XLA
    lowers as a grouped convolution of L tiny (n×hd)·(hd×K) dots (~2%
    MFU) plus ~3 ms/layer of copy/reshape to reach the kernel layout
    (r4 trace: 104 ms per 4-tile batch all told). Here the tables have
    no token dim — one (B·L·n, hd)×(hd, 2H-1+2W-1) MXU matmul — and the
    per-token shifted windows are STATIC lane slices: h_i = i//W is
    constant within a row group, so each of the H row groups takes one
    contiguous slice; reversing the table rows turns the descending
    window ``P[h_i+H-1-j]`` into the ascending slice ``P'[(H-1-h_i)+j]``
    so no flip materializes.
    """
    B, L, n, hd = q_tok.shape
    Th = _interp_rel_pos(rel_pos_h, 2 * H - 1).astype(q_tok.dtype)
    Tw = _interp_rel_pos(rel_pos_w, 2 * W - 1).astype(q_tok.dtype)
    T2 = jnp.concatenate([Th[::-1], Tw[::-1]], axis=0)
    P = jnp.einsum("blnc,kc->blnk", q_tok, T2)  # ONE plain matmul
    nH = 2 * H - 1
    Pg = P.reshape(B, H, W, n, nH + 2 * W - 1)
    rel_h = jnp.stack(
        [Pg[:, h, :, :, H - 1 - h : 2 * H - 1 - h] for h in range(H)],
        axis=1,
    )  # (B, H, W, n, H)
    rel_w = jnp.stack(
        [
            Pg[:, :, w, :, nH + W - 1 - w : nH + 2 * W - 1 - w]
            for w in range(W)
        ],
        axis=2,
    )  # (B, H, W, n, W)
    return jnp.concatenate([rel_h, rel_w], axis=-1).reshape(B, L, n, H + W)


class Attention(nn.Module):
    """Global multi-head attention with SAM decomposed rel-pos bias.

    Input/output: (B, H, W, C) token grids. Matches the math of the
    reference's flash_forward (vit_sam.py:15-65): softmax over
    q·kᵀ·scale + rel_h ⊕ rel_w with the bias computed from *unscaled* q.
    """

    num_heads: int
    use_rel_pos: bool = True
    input_size: tuple[int, int] = (32, 32)
    dtype: jnp.dtype = jnp.float32
    allow_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        L = H * W
        head_dim = C // self.num_heads
        scale = head_dim**-0.5

        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype, name="qkv")(x)

        use_pallas = (
            self.allow_pallas
            and self.use_rel_pos
            and self.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and H * W == L
            and head_dim % 64 == 0
        )
        if use_pallas:
            # token-major path: qkv stays in the (B, L, 3, n, hd) layout
            # the projection emits (free reshapes only); the kernel's
            # BlockSpec index maps slice per-(batch, head) q/k/v in the
            # DMA, so no transpose ever materializes (ROADMAP r2: the
            # (B, n, L, hd) relayouts cost ~270 ms per 4-tile batch)
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim), jnp.float32,
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim), jnp.float32,
            )
            Rh = get_rel_pos(H, H, rel_pos_h).astype(self.dtype)
            Rw = get_rel_pos(W, W, rel_pos_w).astype(self.dtype)
            # q is the first C lanes of the qkv tensor: slicing the minor
            # axis (then splitting it for the einsum) fuses into the
            # einsum's operand read, whereas reshaping the FULL qkv to
            # (..., 3, n, hd) retiles all 630 MB (~3 ms/layer, r3 trace)
            import os as _os

            _rel_mode = _os.environ.get("CLASSPOSE_REL_TOKEN", "cat")
            if _rel_mode == "mat":
                q_tok = qkv[..., :C].reshape(B, L, self.num_heads,
                                             head_dim)
                rel_h = rel_bias_matmul(q_tok, rel_pos_h, rel_pos_w, H, W)
                rel_w = None
            elif _rel_mode == "cat":
                # single concatenated-table formulation: one batched dot
                # against the per-token table [Rh[i//W] | Rw[i%W]]
                # (L, H+W, hd) emits (B, L, n, H+W) — ALREADY the per-head
                # [rh|rw] layout the Pallas kernel consumes, so both the
                # second einsum dispatch and the kernel-feeding concat
                # (+~2 ms/layer of relayout copies, r4 trace) disappear.
                # Per-element math is identical to the two-einsum path
                # (same 64-value contractions of the same table rows).
                q_tok = qkv[..., :C].reshape(B, L, self.num_heads,
                                             head_dim)
                T = jnp.concatenate(
                    [jnp.repeat(Rh, W, axis=0),   # (L, H, hd)
                     jnp.tile(Rw, (H, 1, 1))],    # (L, W, hd)
                    axis=1,
                )  # (L, H+W, hd)
                rel_h = jnp.einsum("blnc,lkc->blnk", q_tok, T)
                rel_w = None
            elif _rel_mode == "1":
                # token-batched formulation: expand Rh/Rw to per-token
                # tables (L, K, hd) — tokens are row-major so h_i = i//W
                # repeats each Rh row W times and w_i = i%W tiles Rw —
                # and contract per token. XLA lowers the (h-grouped)
                # "bhwnc,hkc" spatial einsum as a convolution whose
                # output layout then needs a 1.37 ms copy per call (x48)
                # plus reshapes before the kernel's concat; this batched
                # dot emits (B, L, n, K) directly in the layout
                # flash_attention_relpos_blc consumes (r3 trace: the
                # einsum+copy+reshape chain was ~175 ms vs the kernel's
                # 127 ms). Measured (tools/rel_ab.py, v5e, 100×256²
                # bf16 forward): 681 vs 731 ms wall, max|Δ| = 0.
                q_tok = qkv[..., :C].reshape(B, L, self.num_heads,
                                             head_dim)
                Rh_tok = jnp.repeat(Rh, W, axis=0)  # (L, H, hd)
                Rw_tok = jnp.tile(Rw, (H, 1, 1))    # (L, W, hd)
                rel_h = jnp.einsum("blnc,lkc->blnk", q_tok, Rh_tok)
                rel_w = jnp.einsum("blnc,lkc->blnk", q_tok, Rw_tok)
            else:
                q_hw = qkv[..., :C].reshape(
                    B, H, W, self.num_heads, head_dim
                )
                rel_h = jnp.einsum("bhwnc,hkc->bhwnk", q_hw, Rh).reshape(
                    B, L, self.num_heads, H
                )
                rel_w = jnp.einsum("bhwnc,wkc->bhwnk", q_hw, Rw).reshape(
                    B, L, self.num_heads, W
                )
            from classpose_tpu.nn.attention import flash_attention_relpos_blc

            out = flash_attention_relpos_blc(
                qkv.reshape(B, L, 3 * C), rel_h, rel_w, float(scale),
                grid_hw=(H, W), num_heads=self.num_heads,
            )
            out = out.reshape(B, H, W, C)
            return nn.Dense(C, dtype=self.dtype, name="proj")(out)

        qkv = qkv.reshape(B, L, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # (B, L, heads, hd) each
        q = jnp.swapaxes(q, 1, 2)  # (B, heads, L, hd)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        # at bf16, keep the L×L logits in bf16 (the MXU still accumulates
        # fp32 internally); materializing them in fp32 doubles the HBM
        # traffic of the whole block and dominates runtime at L=1024
        acc_t = (
            jnp.float32 if self.dtype == jnp.float32 else jnp.bfloat16
        )
        attn = jnp.einsum(
            "bnld,bnmd->bnlm", q * scale, k,
            preferred_element_type=acc_t,
        )

        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h",
                nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim),
                jnp.float32,
            )
            rel_pos_w = self.param(
                "rel_pos_w",
                nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim),
                jnp.float32,
            )
            Rh = get_rel_pos(H, H, rel_pos_h).astype(self.dtype)
            Rw = get_rel_pos(W, W, rel_pos_w).astype(self.dtype)
            q_hw = q.reshape(B, self.num_heads, H, W, head_dim)
            rel_h = jnp.einsum(
                "bnhwc,hkc->bnhwk", q_hw, Rh,
                preferred_element_type=acc_t,
            )
            rel_w = jnp.einsum(
                "bnhwc,wkc->bnhwk", q_hw, Rw,
                preferred_element_type=acc_t,
            )
            attn = attn.reshape(B, self.num_heads, H, W, H, W)
            attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
            attn = attn.reshape(B, self.num_heads, L, L)

        if acc_t == jnp.float32:
            attn = jax.nn.softmax(attn, axis=-1)
        else:
            # numerically-safe bf16 softmax: subtract the rowwise max and
            # normalize with an fp32 rowwise sum; the L×L tensor itself
            # never round-trips HBM in fp32
            m = jnp.max(attn, axis=-1, keepdims=True)
            p = jnp.exp((attn - m).astype(jnp.float32)).astype(jnp.bfloat16)
            s = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            attn = (p / s.astype(jnp.bfloat16)).astype(jnp.bfloat16)
        attn = attn.astype(self.dtype)
        out = jnp.einsum(
            "bnlm,bnmd->bnld", attn, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = jnp.swapaxes(out, 1, 2).reshape(B, H, W, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class MLPBlock(nn.Module):
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        # exact-erf GELU (torch nn.GELU default, matching the reference's
        # SAM MLPBlock), but via lax.erf on an f32 upcast instead of
        # nn.gelu(approximate=False): XLA lowers the latter through a
        # branchy erfc path whose predicate bit-packing (u32 shift +
        # reduce-OR over the hidden dim) costs ~3.6x the whole GELU — the
        # r3 trace showed 48 such fusions; the lax.erf form is a plain
        # f32 polynomial (in-context 24-layer micro: 325 -> 252 ms).
        # Same math: 0.5·x·(1 + erf(x/√2)); f32 erf differs from the
        # erfc route only below bf16 resolution.
        #
        # CLASSPOSE_GELU_BARRIER=1 pins a fusion boundary between the
        # lin1 dot and the GELU: the r4 trace shows the dot+GELU output
        # fusion at 5.03 ms/layer vs the dot's ~2.2 ms roofline — the
        # VPU erf epilogue may be serializing the MXU. With the barrier
        # the dot lands clean and the GELU becomes a separate
        # bandwidth-bound pass (~1 ms/layer of HBM traffic). A/B'd on
        # hardware (tools/bench_fwd_ab.py) before changing the default.
        import os as _os

        if _os.environ.get("CLASSPOSE_GELU_BARRIER", "0") == "1":
            x = jax.lax.optimization_barrier(x)
        _gelu = _os.environ.get("CLASSPOSE_GELU", "erf")
        if _gelu == "tanh" and self.dtype != jnp.float32:
            # A/B alternative (bf16 compute only; fp32 keeps the exact
            # parity contract): the tanh approximation's max error vs
            # exact GELU is ~1e-3 absolute near |x|≈2 — below bf16's own
            # ~4e-3 relative resolution there, so the measured path's
            # results are statistically indistinguishable while the VPU
            # drops the erf polynomial for a cheaper tanh.
            x = nn.gelu(x, approximate=True)
        else:
            xf = x.astype(jnp.float32)
            x = (
                0.5 * xf * (1.0 + jax.lax.erf(xf * 0.7071067811865476))
            ).astype(self.dtype)
        return nn.Dense(d, dtype=self.dtype, name="lin2")(x)


class Block(nn.Module):
    """Pre-norm transformer block (SAM image-encoder style, windowless)."""

    num_heads: int
    mlp_ratio: float
    input_size: tuple[int, int]
    dtype: jnp.dtype = jnp.float32
    allow_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        import os

        # CLASSPOSE_VIT_LN_BARRIER=1 pins a fusion boundary between each
        # residual sum and the following LayerNorm's stat reduction: XLA
        # otherwise fuses the f32 mean/var epilogue into the producing
        # matmul, which the r3 device trace showed running at ~45% of
        # the plain matmul's rate (10.5 vs 4.65 ms at production shape).
        # Numerically the barrier is an identity. Perf-only knob, default
        # off until measured on hardware.
        bar = (
            jax.lax.optimization_barrier
            if os.environ.get("CLASSPOSE_VIT_LN_BARRIER") == "1"
            else (lambda v: v)
        )
        from classpose_tpu.nn.layernorm import FastLayerNorm

        shortcut = x
        y = FastLayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(
            bar(x)
        )
        y = Attention(
            self.num_heads,
            input_size=self.input_size,
            dtype=self.dtype,
            allow_pallas=self.allow_pallas,
            name="attn",
        )(y)
        x = shortcut + y
        y = FastLayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(
            bar(x)
        )
        y = MLPBlock(int(x.shape[-1] * self.mlp_ratio), self.dtype, name="mlp")(y)
        return x + y


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over the last (channel) axis of NHWC maps,
    matching SAM's LayerNorm2d (normalizes across channels per pixel)."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        from classpose_tpu.nn.layernorm import (
            layernorm_pallas,
            layernorm_ref,
            layernorm_supported,
            ln_pallas_mode,
        )

        mode = ln_pallas_mode()
        if mode != "off" and layernorm_supported(x):
            return layernorm_pallas(
                x, weight, bias, eps=self.epsilon, fast_var=False,
                interpret=mode == "interpret",
            )
        return layernorm_ref(x, weight, bias, eps=self.epsilon,
                             fast_var=False)


def pixel_shuffle(x: jnp.ndarray, ps: int, n_channels: int) -> jnp.ndarray:
    """Depth-to-space readout equivalent to the reference's frozen identity
    conv_transpose (W2/W3, vit_sam.py:139-144,182-190).

    conv_transpose2d(x, eye(C·ps²).reshape(C·ps², C, ps, ps), stride=ps)
    places input channel c·ps²+dy·ps+dx at output channel c, offset (dy,dx) —
    i.e. exactly this reshape. Input (B, H, W, C·ps²) NHWC → (B, H·ps, W·ps,
    C).
    """
    B, H, W, _ = x.shape
    x = x.reshape(B, H, W, n_channels, ps, ps)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # B, H, dy, W, dx, C
    return x.reshape(B, H * ps, W * ps, n_channels)


class ImageEncoderViT(nn.Module):
    cfg: ClassTransformerConfig

    @nn.compact
    def __call__(self, x, train: bool = False, rdrop_rng=None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        thw = cfg.tokens_hw

        x = nn.Conv(
            cfg.embed_dim,
            (cfg.ps, cfg.ps),
            strides=(cfg.ps, cfg.ps),
            padding="VALID",
            dtype=dt,
            name="patch_embed",
        )(x)

        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, thw, thw, cfg.embed_dim),
            jnp.float32,
        )
        x = x + pos_embed.astype(dt)

        blocks = [
            Block(
                cfg.num_heads,
                cfg.mlp_ratio,
                (thw, thw),
                dtype=dt,
                allow_pallas=cfg.use_pallas_attention,
                name=f"blocks_{i}",
            )
            for i in range(cfg.depth)
        ]
        if train and cfg.rdrop > 0 and rdrop_rng is not None:
            # per-sample random layer-drop ramping 0→rdrop over depth
            # (reference vit_sam.py:165-173)
            p = jnp.linspace(0.0, cfg.rdrop, cfg.depth)
            drop = (
                jax.random.uniform(rdrop_rng, (x.shape[0], cfg.depth)) < p
            ).astype(dt)
            for i, blk in enumerate(blocks):
                m = drop[:, i][:, None, None, None]
                x = x * m + blk(x) * (1 - m)
        else:
            for blk in blocks:
                x = blk(x)

        # neck: 1x1 conv → LN2d → 3x3 conv → LN2d
        x = nn.Conv(
            cfg.neck_dim, (1, 1), use_bias=False, dtype=dt, name="neck_conv1"
        )(x)
        x = LayerNorm2d(dtype=dt, name="neck_ln1")(x)
        x = nn.Conv(
            cfg.neck_dim,
            (3, 3),
            padding=1,
            use_bias=False,
            dtype=dt,
            name="neck_conv2",
        )(x)
        x = LayerNorm2d(dtype=dt, name="neck_ln2")(x)
        return x


class ClassTransformer(nn.Module):
    """Flow-field + semantic class network (reference vit_sam.py:81-197).

    Call contract (matching the torch net): input (B, 3, H, W); returns
    ``(out, style)`` where out is (B, n_cell_classes+3, H, W) when
    n_cell_classes > 1 (class logits first, then [flowY, flowX, cellprob])
    else (B, 3, H, W), and style is (B, 256) zeros.
    """

    cfg: ClassTransformerConfig

    @nn.compact
    def __call__(self, x, train: bool = False, rdrop_rng=None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        # fp32 parity contract: at fp32 the TPU MXU must not silently use
        # bf16x3 passes (reference fp32 outputs are true fp32). The context
        # manager applies at trace time, covering every matmul/conv below.
        prec = "highest" if dt == jnp.float32 else "default"
        ctx = jax.default_matmul_precision(prec)
        ctx.__enter__()
        try:
            return self._forward_impl(x, train, rdrop_rng)
        finally:
            ctx.__exit__(None, None, None)

    def _forward_impl(self, x, train, rdrop_rng):
        cfg = self.cfg
        dt = cfg.compute_dtype
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(dt)  # NCHW → NHWC

        feats = ImageEncoderViT(cfg, name="encoder")(
            x, train=train, rdrop_rng=rdrop_rng
        )

        seg = nn.Conv(
            cfg.nout * cfg.ps**2, (1, 1), dtype=dt, name="out"
        )(feats)
        seg = pixel_shuffle(seg, cfg.ps, cfg.nout)

        if cfg.n_cell_classes > 1:
            if cfg.feature_transformation_structure is not None:
                cls = UNet(
                    out_channels=cfg.n_cell_classes * cfg.ps**2,
                    n_channels=tuple(cfg.feature_transformation_structure),
                    dtype=dt,
                    name="out_class",
                )(feats)
            else:
                cls = nn.Conv(
                    cfg.n_cell_classes * cfg.ps**2,
                    (1, 1),
                    dtype=dt,
                    name="out_class",
                )(feats)
            cls = pixel_shuffle(cls, cfg.ps, cfg.n_cell_classes)
            out = jnp.concatenate([cls, seg], axis=-1)
        else:
            out = seg

        out = jnp.transpose(out, (0, 3, 1, 2))  # NHWC → NCHW contract
        style = jnp.zeros((x.shape[0], 256), dtype=jnp.float32)
        return out, style
