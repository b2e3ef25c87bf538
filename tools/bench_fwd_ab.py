"""TPU A/B of ViT forward variants via env knobs.

Runs the bare 100x256^2 bf16 forward under each setting of
CLASSPOSE_VIT_LN_BARRIER (jax caches cleared between), interleaved wall
medians with readback. Use tools/profile_fwd.py for the per-op trace of
the winner."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp


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

    fns = {}
    for mode in ("0", "1"):
        os.environ["CLASSPOSE_VIT_LN_BARRIER"] = mode
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
        fns[mode] = run
    del os.environ["CLASSPOSE_VIT_LN_BARRIER"]

    # re-warm: the clear_caches for the second variant evicted the first
    # one's in-memory executable; this reloads it from the persistent
    # compile cache before any timed call
    for f in fns.values():
        f()

    times = {k: [] for k in fns}
    for _ in range(7):
        for mode, f in fns.items():
            t0 = time.time()
            f()
            times[mode].append(time.time() - t0)
    for mode, ts in times.items():
        print(f"ln_barrier={mode}: {np.median(ts) * 1e3:7.0f} ms wall")


if __name__ == "__main__":
    main()
