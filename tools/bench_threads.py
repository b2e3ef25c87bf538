"""TPU A/B of the in-flight batch count (inference threads).

The DeviceWorker overlaps batch i's host tail (readback-unpack +
dispatch) with batch i+1's device program via a small thread pool
(pipeline/predict_wsi.py). Two in-flight batches hide most of the
tunnel's per-call latency; this measures whether a third helps (deeper
transfer/compute overlap) or hurts (host contention on the 1-CPU bench
host). Usage:

  CLASSPOSE_GEOM="1024x4" python tools/bench_threads.py
"""

import os
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def main():
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    S, B = (
        int(v)
        for v in os.environ.get("CLASSPOSE_GEOM", "1024x4").split("x")
    )
    ckpt = Path.home() / ".cache/classpose_tpu/bench_ckpt.npz"
    model = ClassposeModel(pretrained_model=str(ckpt), precision="bf16")
    rng = np.random.default_rng(0)
    tiles = rng.uniform(0, 255, size=(B, S, S, 3)).astype(np.uint8)

    def run():
        return model.eval_batch(tiles, batch_size=32, niter=200)

    run()  # compile/warm (cache-hit if bench_geom ran)
    n_iters = max(2, int(round(20e6 / (B * S * S))))
    res = {n: [] for n in (1, 2, 3, 4)}
    for w in range(3):
        for n in res:
            pool = ThreadPoolExecutor(max_workers=n)
            t0 = time.time()
            futs = [pool.submit(run) for _ in range(n_iters)]
            for f in futs:
                f.result()
            dt = time.time() - t0
            pool.shutdown()
            rate = n_iters * B * (S - 64) ** 2 / 1e6 / dt
            res[n].append(rate)
            print(f"# w{w} threads={n}: {rate:.3f} Mpx_eff/s", flush=True)
    for n, r in res.items():
        print(f"threads={n}: {np.median(r):.3f} Mpx_eff/s "
              f"({np.median(r)/0.9216:.3f} tiles1024-eq/s)")


if __name__ == "__main__":
    main()
