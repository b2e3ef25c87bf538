"""Time the post-forward device stages standalone on the TPU.

follow_flows_batched / get_masks_from_positions / qc_filter_masks_fused
on production shapes (4x1024^2, niter=200), readback-forced.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def med(f, n=5):
    f()
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def main():
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.dynamics.masks import (
        follow_flows_batched,
        get_masks_from_positions,
        qc_filter_masks_fused,
    )

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, H, W = 4, 1024, 1024
    dP = jnp.asarray(rng.normal(size=(B, 2, H, W)).astype(np.float32) * 3)
    iscell = jnp.asarray(rng.uniform(size=(B, H, W)) > 0.5)

    ff = jax.jit(lambda d, i: follow_flows_batched(d, i, niter=200))

    def t_ff():
        p = ff(dP, iscell)
        float(jnp.sum(p[:, :, -1, -8:]))

    p = ff(dP, iscell)

    gm = jax.jit(
        lambda pp, ii: jax.vmap(
            lambda a, b: get_masks_from_positions(a, b, return_seeds=True)
        )(pp, ii)
    )

    def t_gm():
        raw, seeds = gm(p, iscell)
        float(jnp.sum(raw[:, -1, -8:].astype(jnp.float32)))

    raw, _ = gm(p, iscell)

    qc = jax.jit(
        lambda r, d: jax.vmap(
            lambda a, b: qc_filter_masks_fused(
                a, b, flow_threshold=0.4, max_size_fraction=0.4,
                dense_output=True, return_window_ok=True,
            )
        )(r, d)
    )

    def t_qc():
        o, ok = qc(raw, dP)
        float(jnp.sum(o[:, -1, -8:].astype(jnp.float32)))

    print(f"follow_flows(200): {med(t_ff):7.1f} ms")
    print(f"get_masks        : {med(t_gm):7.1f} ms")
    print(f"qc_fused         : {med(t_qc):7.1f} ms")


if __name__ == "__main__":
    main()
