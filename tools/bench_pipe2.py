"""Isolate which transfer steals device time under 2-in-flight pipelining.

bench_pipe.py showed pipe2 = 1217 ms/batch vs a 959 ms device program —
~260 ms of bubble that closely matches the 350 ms h2d upload. Modes, each
run 2-in-flight over 12 batches (medians of 3 windows of 4):

  comp      device-resident input, tiny readback  (device-only floor)
  comp+d2h  device-resident input, FULL buffer fetch each call
  h2d+comp  fresh uint8 upload each call, tiny readback
  all       h2d + compute + full fetch (eval_batch minus host post)

If h2d+comp >> comp, the tunnel serializes uploads against compute and
the fix is device-side double buffering (upload batch N+1 into a
dedicated buffer while N computes) or smaller uploads.
"""

import os
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def rate(f, B, nthr=2, windows=3, n_iters=4):
    pool = ThreadPoolExecutor(max_workers=nthr)
    f()
    rates = []
    for _ in range(windows):
        t0 = time.time()
        futs = [pool.submit(f) for _ in range(n_iters)]
        for fu in futs:
            fu.result()
        rates.append(n_iters * B / (time.time() - t0))
    return float(np.median(rates)), rates


def main():
    import jax
    import jax.numpy as jnp

    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    ckpt = Path(
        os.environ.get(
            "CLASSPOSE_BENCH_CKPT",
            str(Path.home() / ".cache/classpose_tpu/bench_ckpt.npz"),
        )
    )
    if not ckpt.exists():
        raise SystemExit(f"bench ckpt not found at {ckpt}")
    model = ClassposeModel(pretrained_model=str(ckpt), precision="bf16")

    rng = np.random.default_rng(0)
    B = 4
    tiles = rng.uniform(0, 255, size=(B, 1024, 1024, 3)).astype(np.uint8)
    model.eval_batch(tiles, batch_size=32, niter=200)  # warm
    (key, (runner, _)), = [
        (k, v) for k, v in model._runners.items() if k[0] == "fused"
    ]
    xt_dev = jnp.asarray(tiles)
    float(jnp.sum(xt_dev[0, :2, 0, 0].astype(jnp.float32)))

    def comp():
        buf = runner(xt_dev)
        float(jnp.sum(buf[:, -8:].astype(jnp.float32)))

    def comp_d2h():
        np.asarray(runner(xt_dev))

    def h2d_comp():
        x = jnp.asarray(tiles)
        buf = runner(x)
        float(jnp.sum(buf[:, -8:].astype(jnp.float32)))

    def allio():
        x = jnp.asarray(tiles)
        np.asarray(runner(x))

    for name, f in [("comp", comp), ("comp+d2h", comp_d2h),
                    ("h2d+comp", h2d_comp), ("all", allio)]:
        r, rs = rate(f, B)
        print(f"{name:9s}: {r:6.3f} tiles/s ({B / r * 1e3:7.1f} ms/batch; "
              + ", ".join(f"{x:.3f}" for x in rs) + ")", flush=True)


if __name__ == "__main__":
    main()
