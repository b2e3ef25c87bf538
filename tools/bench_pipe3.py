"""Steady-state rate of the PREFETCHED pipeline shape on the axon TPU.

bench_link2.py showed the tunnel CAN overlap transfers with compute when
the upload is issued while a program is running (comp||h2d: +52 ms on a
961 ms program for 12.6 MB, vs +311 serial) — the loser is the current
eval_batch shape, which puts the device_put on the inference thread's
critical path BEFORE its own program has been dispatched.

This measures the restructured shape end to end:

  uploader thread:  host batch -> jax.device_put -> bounded queue(depth)
  2 infer threads:  pop device batch -> runner() -> copy_to_host_async()
                    -> np.asarray (fetch) [-> optional host unpack/post]

Modes:
  sync    baseline: upload + compute + fetch all on the infer thread
  pre     prefetched uploads, synchronous fetch
  pre+a   prefetched uploads + copy_to_host_async before the fetch
  full    pre+a plus the real eval_batch host tail (unpack + relabel),
          i.e. the number bench.py would print with the restructure

12 batches each, median of 3 windows of 4.
"""

import os
import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def window_rate(fn_iter, B, n_batches=12, windows=3):
    """fn_iter() consumes one batch; rate over windows of n/windows."""
    per = n_batches // windows
    rates = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(per):
            fn_iter()
        rates.append(per * B / (time.time() - t0))
    return float(np.median(rates)), rates


def main():
    import jax
    import jax.numpy as jnp

    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    dev = jax.devices()[0]
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
    B = int(os.environ.get("CLASSPOSE_BENCH_TILE_BATCH", "4"))
    tiles = rng.integers(0, 255, size=(B, 1024, 1024, 3), dtype=np.uint8)
    model.eval_batch(tiles, batch_size=32, niter=200)  # warm
    (key, (runner, _)), = [
        (k, v) for k, v in model._runners.items() if k[0] == "fused"
    ]

    def force_tiny(r):
        return np.asarray(jax.device_get(r.ravel()[:1]))

    infer = ThreadPoolExecutor(max_workers=2)

    def run_mode(name, prefetch, async_fetch, n_batches=12):
        devq: queue.Queue = queue.Queue(maxsize=3)
        stop = threading.Event()

        def upload_loop():
            # upload ONCE per queue slot: a device_put inside the retry
            # loop would launch a fresh 12.6 MB transfer every 0.2 s
            # timeout, saturating the ~10-125 MB/s tunnel link and
            # starving the compute stream (first run of this harness
            # measured 0.19 tiles/s in "pre" mode from exactly that)
            while not stop.is_set():
                x = jax.device_put(tiles, dev)
                while not stop.is_set():
                    try:
                        devq.put(x, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        up = None
        if prefetch:
            up = threading.Thread(target=upload_loop, daemon=True)
            up.start()

        lock = threading.Lock()

        def one_batch():
            if prefetch:
                x = devq.get()
            else:
                x = jax.device_put(tiles, dev)
            buf = runner(x)
            if async_fetch:
                buf.copy_to_host_async()
            return np.asarray(buf)

        def batch_pair():
            # two in flight, as the DeviceWorker runs
            f1 = infer.submit(one_batch)
            f2 = infer.submit(one_batch)
            f1.result(); f2.result()

        # warm the queue
        batch_pair()
        per = 4
        rates = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(per // 2):
                batch_pair()
            rates.append(per * B / (time.time() - t0))
        stop.set()
        if up is not None:
            try:
                devq.get_nowait()
            except queue.Empty:
                pass
            up.join(timeout=2)
        r = float(np.median(rates))
        print(f"{name:6s}: {r:6.3f} tiles/s ({B / r * 1e3:7.1f} ms/batch; "
              + ", ".join(f"{x:.3f}" for x in rates) + ")", flush=True)

    run_mode("sync", prefetch=False, async_fetch=False)
    run_mode("pre", prefetch=True, async_fetch=False)
    run_mode("pre+a", prefetch=True, async_fetch=True)

    # full: the real eval_batch host tail on top of pre+a — call the
    # model's public API with a device-resident input (eval_batch accepts
    # jax arrays) while a second thread keeps its own batch in flight
    devq: queue.Queue = queue.Queue(maxsize=3)
    stop = threading.Event()

    def upload_loop():
        while not stop.is_set():
            x = jax.device_put(tiles, dev)
            while not stop.is_set():
                try:
                    devq.put(x, timeout=0.2)
                    break
                except queue.Full:
                    continue

    up = threading.Thread(target=upload_loop, daemon=True)
    up.start()

    def one_full():
        x = devq.get()
        model.eval_batch(x, batch_size=32, niter=200)

    f1 = infer.submit(one_full)
    f2 = infer.submit(one_full)
    f1.result(); f2.result()
    rates = []
    for _ in range(3):
        t0 = time.time()
        futs = [infer.submit(one_full) for _ in range(4)]
        for f in futs:
            f.result()
        rates.append(4 * B / (time.time() - t0))
    stop.set()
    try:
        devq.get_nowait()
    except queue.Empty:
        pass
    r = float(np.median(rates))
    print(f"full  : {r:6.3f} tiles/s ({B / r * 1e3:7.1f} ms/batch; "
          + ", ".join(f"{x:.3f}" for x in rates) + ")", flush=True)


if __name__ == "__main__":
    main()
