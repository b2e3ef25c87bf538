"""Microbench: the ViT LayerNorm at production shape (4,25,32,32,1024)
bf16 — standalone vs sandwiched between matmuls, flax vs Pallas."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def med(f, n=7):
    f()
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def main():
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    shape = (4, 25, 32, 32, 1024)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(1024, 1024)).astype(np.float32) * 0.03,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(1024, 1024)).astype(np.float32) * 0.03,
                     jnp.bfloat16)
    scale = jnp.ones((1024,), jnp.float32)
    bias = jnp.zeros((1024,), jnp.float32)

    def ln(y):
        m = jnp.mean(y.astype(jnp.float32), axis=-1, keepdims=True)
        v = jnp.mean(jnp.square(y.astype(jnp.float32) - m), axis=-1,
                     keepdims=True)
        out = (y.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-6)
        return (out * scale + bias).astype(jnp.bfloat16)

    @jax.jit
    def ln_alone(x):
        return ln(x)

    @jax.jit
    def mm_only(x):
        y = x @ w1
        return y @ w2

    @jax.jit
    def mm_ln_mm(x):
        y = x @ w1
        y = ln(y)
        return y @ w2

    @jax.jit
    def mm_ln_mm_x8(x):
        y = x
        for _ in range(8):
            y = ln(y @ w1)
        return y @ w2

    @jax.jit
    def mm_barrier_ln_mm_x8(x):
        # optimization_barrier between the matmul and the LN stats: keeps
        # the stat reduction OUT of the matmul epilogue fusion, so the
        # matmul runs at roofline and the LN is a separate bandwidth pass
        y = x
        for _ in range(8):
            y = ln(jax.lax.optimization_barrier(y @ w1))
        return y @ w2

    @jax.jit
    def mm_mm_x8(x):
        y = x
        for _ in range(8):
            y = y @ w1
        return y @ w2

    def R(f):
        return lambda: float(jnp.sum(f(x)[0, 0, 0, 0, :8].astype(jnp.float32)))

    t_ln = med(R(ln_alone))
    t_mm = med(R(mm_only))
    t_sand = med(R(mm_ln_mm))
    t_x8 = med(R(mm_ln_mm_x8))
    t_x8b = med(R(mm_barrier_ln_mm_x8))
    t_x8n = med(R(mm_mm_x8))
    print(f"LN alone           : {t_ln:7.2f} ms")
    print(f"mm-mm (no LN)      : {t_mm:7.2f} ms")
    print(f"mm-LN-mm           : {t_sand:7.2f} ms   (LN in-context: {t_sand-t_mm:+.2f})")
    print(f"(mm-LN)x8-mm       : {t_x8:7.2f} ms")
    print(f"(mm-BAR-LN)x8-mm   : {t_x8b:7.2f} ms   (barrier effect/LN: {(t_x8b-t_x8)/8:+.2f})")
    print(f"(mm)x8-mm          : {t_x8n:7.2f} ms   (per-LN in-context: {(t_x8-t_x8n)/8:+.2f})")


if __name__ == "__main__":
    main()
