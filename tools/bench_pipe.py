"""Decompose the bench.py workload into pipeline stages on the axon TPU.

bench.py measures two-in-flight eval_batch (the production DeviceWorker
configuration). The device stage sum (~1.05 s/4-tile batch) implies a
~3.8 tiles/s ceiling, while bench measures 2.7-3.3 — this tool attributes
the missing 150-400 ms/batch. Stages, all readback-forced (CLAUDE.md axon
ground rules: block_until_ready is a no-op on the tunnel):

  h2d    12 MB uint8 tile upload
  comp   fused device program with device-resident input, tiny readback
  d2h    full packed-buffer fetch
  solo   one eval_batch call end-to-end (h2d+comp+d2h+host post)
  hostp  residual: solo - h2d - comp - d2h (unpack, relabel, hole fill,
         class vote on host)
  pipeN  N-in-flight ThreadPool rate over 12 batches (N=2 is bench.py)

Uses the structured bench checkpoint so dynamics/QC run at real load;
errors out if it is missing (ADVICE r3: silent random-init fallbacks
make floor measurements masquerade as the real workload).
"""

import os
import sys
import time
from pathlib import Path

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

    enable_compilation_cache()
    ckpt = Path(
        os.environ.get(
            "CLASSPOSE_BENCH_CKPT",
            str(Path.home() / ".cache/classpose_tpu/bench_ckpt.npz"),
        )
    )
    if not ckpt.exists():
        raise SystemExit(
            f"bench ckpt not found at {ckpt}; run bench.py once (or "
            "tools/make_bench_ckpt.py) so dynamics run at real load"
        )
    model = ClassposeModel(pretrained_model=str(ckpt), precision="bf16")

    rng = np.random.default_rng(0)
    B = int(os.environ.get("CLASSPOSE_BENCH_TILE_BATCH", "4"))
    tiles = rng.uniform(0, 255, size=(B, 1024, 1024, 3)).astype(np.uint8)

    def full():
        model.eval_batch(tiles, batch_size=32, niter=200)

    full()  # warm/compile
    (key, (runner, _)), = [
        (k, v) for k, v in model._runners.items() if k[0] == "fused"
    ]

    xt_dev = jnp.asarray(tiles)
    float(jnp.sum(xt_dev[0, :2, 0, 0].astype(jnp.float32)))  # settle

    def h2d():
        x = jnp.asarray(tiles)
        float(jnp.sum(x[-1, -1, -8:, 0].astype(jnp.float32)))

    def compute_only():
        buf = runner(xt_dev)
        float(jnp.sum(buf[:, -8:].astype(jnp.float32)))

    out = runner(xt_dev)

    def d2h():
        np.asarray(out)

    t_h2d = med(h2d)
    t_comp = med(compute_only)
    t_d2h = med(d2h)
    t_full = med(full)
    in_mb = tiles.nbytes / 1e6
    out_mb = out.nbytes / 1e6
    print(f"h2d  {in_mb:6.1f} MB : {t_h2d:7.1f} ms "
          f"({in_mb / t_h2d * 1e3:6.1f} MB/s)", flush=True)
    print(f"comp            : {t_comp:7.1f} ms", flush=True)
    print(f"d2h  {out_mb:6.1f} MB : {t_d2h:7.1f} ms "
          f"({out_mb / t_d2h * 1e3:6.1f} MB/s)", flush=True)
    print(f"solo eval_batch : {t_full:7.1f} ms "
          f"(residual host post {t_full - t_h2d - t_comp - t_d2h:7.1f} ms)",
          flush=True)

    from concurrent.futures import ThreadPoolExecutor

    for nthr in (2, 3):
        pool = ThreadPoolExecutor(max_workers=nthr)
        rates = []
        for _ in range(3):
            n_iters = 4
            t0 = time.time()
            futs = [pool.submit(full) for _ in range(n_iters)]
            for f in futs:
                f.result()
            rates.append(n_iters * B / (time.time() - t0))
        r = float(np.median(rates))
        print(f"pipe{nthr}: {r:6.3f} tiles/s ({B / r * 1e3:7.1f} ms/batch;"
              f" runs {', '.join(f'{x:.3f}' for x in rates)})", flush=True)


if __name__ == "__main__":
    main()
