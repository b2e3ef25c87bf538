"""TPU A/B of the MLP GELU formulation on the full ViT forward:
CLASSPOSE_GELU=erf (exact, f32 upcast — default) vs tanh (bf16
approximate). Interleaved wall medians + output delta."""

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

    fns, outs = {}, {}
    for name, v in (("gelu_erf", "erf"), ("gelu_tanh", "tanh")):
        os.environ["CLASSPOSE_GELU"] = v
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

        outs[name] = np.asarray(run().astype(jnp.float32))
        fns[name] = run

    print(
        "max|delta| tanh vs erf:",
        float(np.abs(outs["gelu_tanh"] - outs["gelu_erf"]).max()),
        flush=True,
    )
    for name, v in (("gelu_erf", "erf"), ("gelu_tanh", "tanh")):
        os.environ["CLASSPOSE_GELU"] = v
        fns[name]()
    os.environ.pop("CLASSPOSE_GELU", None)

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
