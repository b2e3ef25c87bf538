"""Microbenchmarks on the real TPU for the round-3 optimization targets.

Interleaves A/B variants in one process and reports medians (axon ground
rules: block_until_ready is a no-op — force completion with readbacks).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, n=5):
    fn(*args)  # compile
    outs = []
    for _ in range(n):
        t0 = time.time()
        r = fn(*args)
        # force completion with a tiny readback
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(jnp.sum(jnp.ravel(leaf)[:8]).astype(jnp.float32))
        outs.append(time.time() - t0)
    return float(np.median(outs)) * 1e3


def bench_sampler():
    from classpose_tpu.ops.sample_pallas import shift_sample_pallas
    from classpose_tpu.dynamics.masks import _bilinear2, _shift_sample2

    rng = np.random.default_rng(0)
    B, H, W = 4, 1024, 1024
    u = jnp.asarray(rng.normal(size=(B, 2, H, W)).astype(np.float32))
    gy = np.broadcast_to(
        np.arange(H, dtype=np.float32)[:, None], (H, W)
    )
    gx = np.broadcast_to(
        np.arange(W, dtype=np.float32)[None, :], (H, W)
    )

    gather = jax.jit(
        lambda u, py, px: jax.vmap(
            lambda f, a, b: jnp.stack(_bilinear2(f, a, b))
        )(u, py, px)
    )

    import sys
    bounds = tuple(
        int(b) for b in (sys.argv[1].split(",") if len(sys.argv) > 1
                         else (2, 8, 16, 32))
    )
    for bound in bounds:
        disp = rng.uniform(-bound, bound, size=(B, 2, H, W)).astype(
            np.float32
        )
        py = jnp.asarray(np.clip(gy[None] + disp[:, 0], 0, H - 1))
        px = jnp.asarray(np.clip(gx[None] + disp[:, 1], 0, W - 1))
        t_pallas = timed(
            lambda u, py, px, b=bound: shift_sample_pallas(
                u, py, px, D=b + 1
            ),
            u, py, px,
        )
        t_gather = timed(gather, u, py, px)
        line = (f"bound {bound:3d}: pallas {t_pallas:7.1f} ms   "
                f"gather {t_gather:7.1f} ms")
        if bound in (2, 8):
            D = 3 if bound == 2 else 9
            xla_shift = jax.jit(
                lambda u, py, px, D=D: jax.vmap(
                    lambda f, a, b: _shift_sample2(f, a, b, D)
                )(u, py, px)
            )
            t_x = timed(xla_shift, u, py, px)
            line += f"   xla-shift(D={D}) {t_x:7.1f} ms"
        print(line, flush=True)


def bench_layernorm():
    rng = np.random.default_rng(1)
    T, C = 100 * 1024, 1024  # 4 chunks x 25 tiles worth of tokens
    x = jnp.asarray(
        rng.normal(size=(T, C)).astype(np.float32), jnp.bfloat16
    )
    scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    @jax.jit
    def ln_flax_style(x):
        xf = x.astype(jnp.float32)
        m = xf.mean(-1, keepdims=True)
        v = ((xf - m) ** 2).mean(-1, keepdims=True)
        y = (xf - m) * jax.lax.rsqrt(v + 1e-6)
        return (y * scale + bias).astype(jnp.bfloat16)

    ones = jnp.ones((C, 1), jnp.bfloat16)

    @jax.jit
    def ln_dot(x):
        m = jax.lax.dot_general(
            x, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / C  # (T, 1) fp32
        e2 = jax.lax.dot_general(
            x * x, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / C
        v = e2 - m * m
        y = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-6)
        return (y * scale + bias).astype(jnp.bfloat16)

    @jax.jit
    def ln_bf16(x):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        y = (x - m) * jax.lax.rsqrt(v + 1e-6)
        return y * scale.astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)

    t1 = timed(ln_flax_style, x)
    t2 = timed(ln_dot, x)
    t3 = timed(ln_bf16, x)
    print(f"LN fp32-stats {t1:6.1f} ms   MXU-dot {t2:6.1f} ms   "
          f"bf16 {t3:6.1f} ms  (x24 layers x2 norms)", flush=True)
    # numeric sanity
    a = np.asarray(ln_flax_style(x), np.float32)
    b = np.asarray(ln_dot(x), np.float32)
    print("  dot-vs-fp32 max abs diff:", np.abs(a - b).max(), flush=True)


if __name__ == "__main__":
    from classpose_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    bench_layernorm()
    bench_sampler()
