"""A/B: get_masks Pallas kernels and follow_flows pass costs at the
REALISTIC design-field load (1024 cells/tile, 8x1024², the structured
bench checkpoint's output). Run SOLO. Unbuffered prints (run python -u).
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def med(f, n=7):
    f()
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def force(x):
    return float(jnp.sum(x.astype(jnp.float32)[..., -1, -8:]))


def main():
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.nn.synthetic import design_field

    enable_compilation_cache()
    B, H, W = 8, 1024, 1024
    f = design_field(256)
    f = np.tile(f, (1, H // 256, W // 256))
    dP = jnp.asarray(np.broadcast_to(f[None, :2], (B, 2, H, W)).copy())
    iscell = jnp.asarray(np.broadcast_to(f[2] > 0, (B, H, W)).copy())

    from classpose_tpu.dynamics.masks import (
        follow_flows_batched,
        get_masks_from_positions_batched,
    )

    ff = jax.jit(lambda d, i: follow_flows_batched(d, i, niter=200))
    p = ff(dP, iscell)
    print(f"follow_flows(200)        : {med(lambda: force(ff(dP, iscell))):7.1f} ms", flush=True)

    # individual squaring-pass costs at each displacement bound
    from classpose_tpu.dynamics.masks import _sample_static

    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[None]
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[None]
    u = (dP * iscell[:, None].astype(dP.dtype) / 5.0).astype(jnp.float32)
    u = jnp.clip(u, -2.0, 2.0)
    u = jnp.stack(
        [jnp.clip(gy + u[:, 0], 0.0, H - 1.0) - gy,
         jnp.clip(gx + u[:, 1], 0.0, W - 1.0) - gx], axis=1
    )
    for bound in (2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0, 256.0):
        samp = jax.jit(
            lambda uu, b=bound: _sample_static(
                uu, gy + uu[:, 0], gx + uu[:, 1], b
            )
        )
        samp(u)
        print(f"  one pass bound={bound:5.0f}  : {med(lambda: force(samp(u))):7.1f} ms", flush=True)

    # get_masks: XLA scatter/gather vs Pallas stripe kernels. Use the
    # undecorated body so the env knob is re-read per fresh trace (the
    # decorated function's jit cache would pin the first trace's choice).
    body = get_masks_from_positions_batched.__wrapped__
    for gm in ("0", "1"):
        os.environ["CLASSPOSE_GM_PALLAS"] = gm
        gmf = jax.jit(lambda pp, ii: body(pp, ii, return_seeds=True)[0])
        gmf(p, iscell)
        print(f"get_masks GM_PALLAS={gm}    : {med(lambda: force(gmf(p, iscell))):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
