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


def bench_block():
    """In-context LN cost: two stacked ViT blocks with the production
    pallas attention, comparing LN stat strategies on the real
    (B, 25, 32, 32, 1024)-token shapes."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from classpose_tpu.nn.attention import flash_attention_relpos_blc

    rng = np.random.default_rng(0)
    B, n, hd, C = 100, 16, 64, 1024
    H = W = 32
    L = H * W
    x = jnp.asarray(rng.normal(size=(B, L, C)) * 0.5, jnp.bfloat16)
    Wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.02, jnp.bfloat16)
    Wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.02, jnp.bfloat16)
    W1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.02, jnp.bfloat16)
    W2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.02, jnp.bfloat16)
    scale_p = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    bias_p = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    ones = jnp.ones((C, 1), jnp.bfloat16)

    def ln_f32(x):
        xf = x.astype(jnp.float32)
        m = xf.mean(-1, keepdims=True)
        v = ((xf - m) ** 2).mean(-1, keepdims=True)
        y = (xf - m) * jax.lax.rsqrt(v + 1e-6)
        return (y * scale_p + bias_p).astype(jnp.bfloat16)

    def ln_dot(x):
        m = jax.lax.dot_general(
            x, ones, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / C
        e2 = jax.lax.dot_general(
            x * x, ones, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / C
        v = jnp.maximum(e2 - m * m, 0.0)
        y = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-6)
        return (y * scale_p + bias_p).astype(jnp.bfloat16)

    def block(x, ln):
        y = ln(x)
        qkv = (y @ Wqkv).reshape(B, L, 3, n, hd)
        rel_h = jnp.asarray(
            np.zeros((B, L, n, H), np.float32), jnp.bfloat16)
        rel_w = jnp.asarray(
            np.zeros((B, L, n, W), np.float32), jnp.bfloat16)
        a = flash_attention_relpos_blc(
            qkv, rel_h, rel_w, hd ** -0.5, grid_hw=(H, W)
        ).reshape(B, L, C)
        x = x + a @ Wproj
        y = ln(x)
        x = x + jax.nn.gelu(y @ W1, approximate=False) @ W2
        return x

    for name, ln in (("f32-stats", ln_f32), ("mxu-dot", ln_dot)):
        f = jax.jit(lambda x, ln=ln: block(block(x, ln), ln))
        t = timed(f, x)
        print(f"2-block {name}: {t:7.1f} ms", flush=True)


if __name__ == "__main__":
    from classpose_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    import sys

    print("platform:", jax.devices()[0].platform)
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    if which in ("all", "ln"):
        bench_layernorm()
    if which in ("all", "block"):
        bench_block()
    if which in ("all", "sampler"):
        bench_sampler()