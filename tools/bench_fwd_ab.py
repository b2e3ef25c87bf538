"""TPU A/B of ViT forward variants via env knobs.

Runs the bare 100x256^2 bf16 forward under each combination of
CLASSPOSE_VIT_LN_BARRIER x CLASSPOSE_ATTN_V2 (jax caches cleared between
compiles so each variant traces under its own env), interleaved wall
medians with readback. Use tools/profile_fwd.py for the per-op trace of
the winner."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

KNOBS = ("CLASSPOSE_VIT_LN_BARRIER", "CLASSPOSE_ATTN_V2")
VARIANTS = [
    ("base", {"CLASSPOSE_VIT_LN_BARRIER": "0", "CLASSPOSE_ATTN_V2": "0"}),
    ("ln_barrier", {"CLASSPOSE_VIT_LN_BARRIER": "1",
                    "CLASSPOSE_ATTN_V2": "0"}),
    ("attn_v2", {"CLASSPOSE_VIT_LN_BARRIER": "0",
                 "CLASSPOSE_ATTN_V2": "1"}),
    ("both", {"CLASSPOSE_VIT_LN_BARRIER": "1", "CLASSPOSE_ATTN_V2": "1"}),
]


def main():
    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    cfg = ClassTransformerConfig(n_cell_classes=6, dtype="bfloat16")
    model = ClassposeModel(cfg=cfg, precision="bf16")

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        rng.normal(size=(4, 25, 3, 256, 256)).astype(np.float32),
        jnp.bfloat16,
    )

    def set_env(env):
        for k in KNOBS:
            os.environ[k] = env[k]

    fns = {}
    for name, env in VARIANTS:
        set_env(env)
        jax.clear_caches()

        @jax.jit
        def fwd(t):
            def one(chunk):
                y, _ = model._apply(chunk)
                return y
            return jax.vmap(one)(t)

        def run(fwd=fwd):
            return float(
                jnp.sum(fwd(tiles)[0, 0, 0, 0, :8].astype(jnp.float32))
            )

        run()  # compile under this env
        fns[name] = run

    # chunk-size sweep (MXU batch shape): same total 100 crops, fed as
    # 4x25 / 2x50 / 1x100 chunks under the default env. The pipeline's
    # batch_size knob maps onto whichever chunking wins.
    set_env(VARIANTS[0][1])
    jax.clear_caches()
    for nchunk, bs in ((2, 50), (1, 100)):
        tc = tiles.reshape(nchunk, bs, 3, 256, 256)

        @jax.jit
        def fwd_c(t):
            def one(chunk):
                y, _ = model._apply(chunk)
                return y
            return jax.lax.map(one, t)

        def run_c(fwd_c=fwd_c, tc=tc):
            return float(
                jnp.sum(fwd_c(tc)[0, 0, 0, 0, :8].astype(jnp.float32))
            )

        run_c()
        fns[f"chunk{bs}"] = run_c

    # re-warm: each clear_caches evicted the previous variant's in-memory
    # executable; reload from the persistent compile cache BEFORE timing,
    # with the matching env set in case of a retrace
    for name, env in VARIANTS:
        set_env(env)
        fns[name]()
    set_env(VARIANTS[0][1])
    for name in fns:
        if name.startswith("chunk"):
            fns[name]()
    for k in KNOBS:
        os.environ.pop(k, None)

    times = {k: [] for k in fns}
    for _ in range(7):
        for name, f in fns.items():
            t0 = time.time()
            f()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name}: {np.median(ts) * 1e3:7.0f} ms wall")


if __name__ == "__main__":
    main()
