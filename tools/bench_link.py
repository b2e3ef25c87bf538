"""Probe the axon tunnel's share of eval_batch wall time.

Times, in one process: (a) h2d device_put of a 4-tile uint8 batch,
(b) d2h fetch of a packed result buffer, (c) eval_batch wall with host
tiles (production), (d) eval_batch wall when the input is already on
device (isolates compute+readback). Medians of 5.
"""

import time

import numpy as np


def med(f, n=5, warm=1):
    for _ in range(warm):
        f()
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel
    from pathlib import Path

    enable_compilation_cache()
    ckpt = Path.home() / ".cache/classpose_tpu/bench_ckpt.npz"
    model = ClassposeModel(pretrained_model=str(ckpt), precision="bf16")

    rng = np.random.default_rng(0)
    tiles = rng.uniform(0, 255, size=(4, 1024, 1024, 3)).astype(np.uint8)

    dev = jax.devices()[0]

    def h2d():
        r = jax.device_put(tiles, dev)
        r.block_until_ready()
        # force actual completion with a readback of one element
        return int(np.asarray(r[0, 0, 0, 0]))

    print(f"h2d 12.6MB uint8: {med(h2d):7.1f} ms wall", flush=True)

    buf = jnp.zeros((4, 3 * 1024 * 1024 + 5), jnp.uint8) + 1

    def d2h():
        return np.asarray(buf)

    print(f"d2h 12.6MB uint8: {med(d2h):7.1f} ms wall", flush=True)

    def ev_host():
        return model.eval_batch(tiles, batch_size=32, niter=200)

    print(f"eval_batch (host tiles): {med(ev_host):7.1f} ms wall",
          flush=True)

    tiles_dev = jax.device_put(tiles, dev)

    def ev_dev():
        return model.eval_batch(tiles_dev, batch_size=32, niter=200)

    print(f"eval_batch (device tiles): {med(ev_dev):7.1f} ms wall",
          flush=True)


if __name__ == "__main__":
    main()
