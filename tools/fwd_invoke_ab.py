"""A/B: ViT forward invocation style at the production 8-tile shape.

The fused eval_batch program runs the network under ``vmap(per_tile)``
— the Pallas attention kernel then executes with a prepended vmap grid
dimension (grid (8, BN)) and every dense op carries a (8, 25, ...)
batch. The r5 trace put the attention-kernel bucket at 741 ms/8-tile
batch while the standalone micro (tools/attn_v3.py) predicts ~233 ms,
so this tool times the SAME apply at the same total crop count under
three invocation styles, interleaved:

  vmap : jax.vmap(lambda c: lax.map(fwd, c)) over 8 tiles of 1x25 chunks
         (exactly what _build_batched_fused traces today)
  map  : lax.map(fwd, (8, 25, ...)) — 8 sequential 25-crop chunks,
         no vmap dimension anywhere
  flat : fwd((200, ...)) — one flat 200-crop forward

Axon rules (CLAUDE.md): readback forces completion; interleave
variants; medians.
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    ckpt = os.path.expanduser("~/.cache/classpose_tpu/bench_ckpt.npz")
    model = ClassposeModel(pretrained_model=ckpt, precision="bf16")

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(8, 25, 3, 256, 256)).astype(np.float32),
        jnp.bfloat16,
    )

    def fwd(chunk):
        y, _ = model._apply(chunk)
        return y

    @jax.jit
    def style_vmap(t):
        def per_tile(c):
            return jax.lax.map(fwd, c.reshape((1,) + c.shape))
        return jax.vmap(per_tile)(t)

    @jax.jit
    def style_map(t):
        return jax.lax.map(fwd, t)

    @jax.jit
    def style_flat(t):
        return fwd(t.reshape((200,) + t.shape[2:]))

    variants = {
        "vmap": lambda: style_vmap(x),
        "map": lambda: style_map(x),
        "flat": lambda: style_flat(x),
    }

    def run(f):
        r = f()
        return float(jnp.sum(jnp.ravel(r)[:8].astype(jnp.float32)))

    for name, f in variants.items():
        run(f)  # compile
        print(f"compiled {name}", flush=True)

    times: dict = {k: [] for k in variants}
    for rep in range(5):
        for name, f in variants.items():
            t0 = time.time()
            run(f)
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        ms = sorted(t * 1e3 for t in ts)
        print(f"{name:5s}: median {ms[len(ms)//2]:7.1f} ms  "
              f"(all {[round(t, 1) for t in ms]})", flush=True)


if __name__ == "__main__":
    main()
