"""TPU A/B of round-4 forward knobs on the full ViT forward:
attention head-block width CLASSPOSE_ATTN_PAIR=2 (default) vs 4 vs 8,
and the lin1→GELU fusion barrier CLASSPOSE_GELU_BARRIER. Interleaved
wall medians + output delta vs base."""

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

    KNOBS = ("CLASSPOSE_ATTN_PAIR", "CLASSPOSE_GELU_BARRIER")
    variants = [
        ("pair2", {"CLASSPOSE_ATTN_PAIR": "2"}),
        ("pair4", {"CLASSPOSE_ATTN_PAIR": "4"}),
        ("pair8", {"CLASSPOSE_ATTN_PAIR": "8"}),
        ("gelu_barrier", {"CLASSPOSE_ATTN_PAIR": "2",
                          "CLASSPOSE_GELU_BARRIER": "1"}),
    ]

    def set_env(env):
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)

    fns, outs = {}, {}
    for name, v in variants:
        set_env(v)
        jax.clear_caches()

        @jax.jit
        def fwd(t):
            def one(chunk):
                y, _ = model._apply(chunk)
                return y
            return jax.vmap(one)(t)

        def run(fwd=fwd):
            r = fwd(tiles)
            np.asarray(r[0, 0, 0, 0, :8])
            return r

        try:
            outs[name] = np.asarray(run().astype(jnp.float32))
        except Exception as exc:  # pair8 OOMs scoped VMEM on v5e
            print(f"{name}: failed to compile/run "
                  f"({str(exc)[:120]}) — skipped", flush=True)
            continue
        fns[name] = run

    for name in fns:
        if name != "pair2" and "pair2" in outs:
            print(
                f"max|delta| {name} vs pair2:",
                float(np.abs(outs[name] - outs["pair2"]).max()),
                flush=True,
            )
    # re-prime each variant under its own env (clear_caches above wiped
    # earlier traces)
    for name, v in variants:
        if name in fns:
            set_env(v)
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
