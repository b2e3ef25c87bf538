"""One-pass Pallas LayerNorm (A/B alternative; default off).

History: the r3 device trace showed ~10.5 ms ``convert_reduce_fusion``
ops around each transformer block that looked like the LayerNorm stat
reductions; this kernel was built to replace them. The A/B
(tools/ln_ab.py) then showed the kernel is slightly SLOWER in-context —
XLA fuses LN into the neighboring residual/matmul fusions — and the
expensive fusions were actually the erfc-lowered exact GELU (fixed at
nn/vit_sam.py MLPBlock via lax.erf). The kernel and its flax-compatible
wrapper stay: they pin the LN math with a parity test and remain one
env flip away (CLASSPOSE_LN_PALLAS=1) if a future XLA version regresses
the fused lowering.

Kernel: whole LayerNorm (f32 stats + normalize + affine + cast) in ONE
VMEM pass per row block. Math matches flax ``nn.LayerNorm`` exactly
(fast-variance form ``max(0, E[x²] − E[x]²)``, f32 throughout, final
cast) up to f32 reduction order; a two-pass variance variant covers
SAM's LayerNorm2d convention (reference vit_sam.py:139-144 neck).
``CLASSPOSE_LN_PALLAS=interpret`` runs it in interpreter mode (CPU test
path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps, fast_var):
    x = x_ref[...].astype(jnp.float32)  # (R, C)
    C = x.shape[-1]
    mu = jnp.sum(x, axis=-1, keepdims=True) / C
    if fast_var:
        ms = jnp.sum(x * x, axis=-1, keepdims=True) / C
        var = jnp.maximum(ms - mu * mu, 0.0)
    else:
        d = x - mu
        var = jnp.sum(d * d, axis=-1, keepdims=True) / C
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _pick_rows(M: int) -> int | None:
    for R in (512, 256, 128, 64, 32, 16, 8):
        if M % R == 0:
            return R
    return None


def ln_pallas_mode() -> str:
    """"on", "off" (default), or "interpret" (CPU-testable path).

    Default OFF: the r3 A/B (tools/ln_ab.py) measured the kernel ~25 ms
    SLOWER than XLA's LayerNorm on the full 100-crop ViT forward (755 vs
    730 ms) — XLA fuses the stat reduction and normalize into the
    surrounding residual/matmul fusions, which the opaque kernel
    boundary forfeits. (The ~10.5 ms "convert_reduce" fusions that
    motivated this kernel turned out to be the erfc-lowered GELU, fixed
    in nn/vit_sam.py MLPBlock.) The kernel stays for future A/Bs via
    CLASSPOSE_LN_PALLAS=1."""
    import os

    ov = os.environ.get("CLASSPOSE_LN_PALLAS")
    if ov in ("1", "on"):
        return "on"
    if ov == "interpret":
        return "interpret"
    return "off"


def layernorm_supported(x: jnp.ndarray) -> bool:
    C = x.shape[-1]
    M = int(np.prod(x.shape[:-1]))
    return (
        x.dtype == jnp.bfloat16
        and C % 128 == 0
        and C <= 2048
        and _pick_rows(M) is not None
    )


@partial(jax.jit, static_argnames=("eps", "fast_var", "interpret"))
def layernorm_pallas(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
    fast_var: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm over the last axis of ``x`` in one VMEM pass per block.

    ``scale``/``bias`` are (C,) f32 affine params; output is in
    ``x.dtype``. ``fast_var`` selects flax's E[x²]−E[x]² variance
    (nn.LayerNorm default) vs the two-pass E[(x−μ)²] (LayerNorm2d
    convention).
    """
    shp = x.shape
    C = shp[-1]
    M = int(np.prod(shp[:-1]))
    R = _pick_rows(M)
    x2 = x.reshape(M, C)
    out = pl.pallas_call(
        partial(_ln_kernel, eps=float(eps), fast_var=fast_var),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        grid=(M // R,),
        in_specs=[
            pl.BlockSpec((R, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x2, scale.reshape(1, C), bias.reshape(1, C))
    return out.reshape(shp)


import flax.linen as nn  # noqa: E402


class FastLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm(epsilon, dtype)`` with the same param
    names/shapes ("scale"/"bias", (C,) f32 — checkpoints graft
    unchanged) that dispatches to :func:`layernorm_pallas` on the bf16
    TPU path and to the identical-math XLA reference otherwise."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (C,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (C,), jnp.float32
        )
        mode = ln_pallas_mode()
        if mode != "off" and layernorm_supported(x):
            return layernorm_pallas(
                x, scale, bias, eps=self.epsilon, fast_var=True,
                interpret=mode == "interpret",
            )
        return layernorm_ref(x, scale, bias, eps=self.epsilon,
                             fast_var=True)


def layernorm_ref(x, scale, bias, eps=1e-6, fast_var=True):
    """XLA reference with identical math (flax nn.LayerNorm semantics for
    ``fast_var=True``); the fallback path and the kernel's parity oracle."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    if fast_var:
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
        )
    else:
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)
