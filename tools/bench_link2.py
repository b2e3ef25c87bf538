"""Axon-link anatomy: latency vs bandwidth, and transfer/compute overlap.

bench_pipe2.py showed transfers add FULLY to device time under the
2-in-flight pipeline (comp 944 ms/batch; +h2d -> +311; +d2h -> +119),
i.e. the tunnel behaves as if host<->device DMA serializes against
program execution. This probe decomposes why and what (if anything)
can overlap:

  lat/bw   device_put of 4 KB / 1 MB / 12.6 MB / 25 MB, completion-forced
           (readback of one element): separates per-RPC latency from
           stream bandwidth; decides whether bigger tile batches amortize
  async?   device_put WITHOUT completion-forcing: does dispatch return
           before the bytes move (async send) or after (sync send)?
  h2d+c    issue the 944 ms fused program on resident data, then
           IMMEDIATELY device_put 12.6 MB from the same thread, then force
           both: wall vs max(sum, parts) says whether the upload rode
           under the running program
  d2hasync copy_to_host_async(buf) issued before dispatching the next
           program: does the fetch overlap execution?
  par4     12.6 MB uploaded as 4 x 3.15 MB from 4 threads: does the relay
           multiplex streams (multi-connection speedup)?

One TPU process; run solo (CLAUDE.md measurement rules).
"""

import os
import time
from concurrent.futures import ThreadPoolExecutor
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
    return float(np.median(ts)) * 1e3, ts


def main():
    import jax
    import jax.numpy as jnp

    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    def force(r):
        # tiny readback — the only thing that truly blocks on axon
        return np.asarray(jax.device_get(r.ravel()[:1]))

    # --- latency vs bandwidth -------------------------------------------
    for mb in (0.004, 1.0, 12.6, 25.2):
        nbytes = int(mb * 1e6)
        host = rng.integers(0, 255, size=nbytes, dtype=np.uint8)

        def put():
            r = jax.device_put(host, dev)
            force(r)

        t, _ = med(put)
        print(f"h2d {mb:6.3f} MB forced : {t:7.1f} ms "
              f"({mb / t * 1e3:7.1f} MB/s)", flush=True)

    host12 = rng.integers(0, 255, size=(4, 1024, 1024, 3), dtype=np.uint8)

    def put_nowait():
        jax.device_put(host12, dev)

    t_nw, runs = med(put_nowait)
    print(f"h2d 12.6 MB no-wait: {t_nw:7.1f} ms (dispatch only; runs "
          + ", ".join(f"{x*1e3:.0f}" for x in [r for r in runs]) + ")",
          flush=True)

    # --- d2h ------------------------------------------------------------
    buf = jax.device_put(
        rng.integers(0, 255, size=(4, 3 * 1024 * 1024 + 5), dtype=np.uint8),
        dev)
    force(buf)

    def fetch():
        np.asarray(buf)

    t_d2h, _ = med(fetch)
    mb = buf.nbytes / 1e6
    print(f"d2h {mb:6.1f} MB        : {t_d2h:7.1f} ms "
          f"({mb / t_d2h * 1e3:7.1f} MB/s)", flush=True)

    # --- overlap probes need the real 944 ms program --------------------
    ckpt = Path(
        os.environ.get(
            "CLASSPOSE_BENCH_CKPT",
            str(Path.home() / ".cache/classpose_tpu/bench_ckpt.npz"),
        )
    )
    if not ckpt.exists():
        raise SystemExit(f"bench ckpt not found at {ckpt}")
    model = ClassposeModel(pretrained_model=str(ckpt), precision="bf16")
    tiles = rng.integers(0, 255, size=(4, 1024, 1024, 3), dtype=np.uint8)
    model.eval_batch(tiles, batch_size=32, niter=200)  # warm
    (key, (runner, _)), = [
        (k, v) for k, v in model._runners.items() if k[0] == "fused"
    ]
    xt_dev = jax.device_put(tiles, dev)
    force(xt_dev)

    def comp_only():
        r = runner(xt_dev)
        force(r)

    t_c, _ = med(comp_only)
    print(f"comp solo          : {t_c:7.1f} ms", flush=True)

    def comp_then_put():
        r = runner(xt_dev)          # dispatch (async)
        x2 = jax.device_put(host12, dev)
        force(x2)
        force(r)

    t_cp, _ = med(comp_then_put)
    print(f"comp||h2d same thr : {t_cp:7.1f} ms "
          f"(sum would be {t_c + 311:.0f}, overlap -> ~{t_c:.0f})",
          flush=True)

    pool = ThreadPoolExecutor(max_workers=4)

    def comp_put_2thr():
        f1 = pool.submit(comp_only)
        f2 = pool.submit(lambda: force(jax.device_put(host12, dev)))
        f1.result(); f2.result()

    t_cp2, _ = med(comp_put_2thr)
    print(f"comp||h2d 2 thr    : {t_cp2:7.1f} ms", flush=True)

    # d2h async overlap: start async fetch of a resident buffer, then run
    # the program; if the fetch rides under execution, wall ~ comp
    big = runner(xt_dev)
    force(big)

    def comp_with_async_fetch():
        big.copy_to_host_async()
        r = runner(xt_dev)
        np.asarray(big)
        force(r)

    try:
        t_cf, _ = med(comp_with_async_fetch)
        print(f"comp||d2h async    : {t_cf:7.1f} ms "
              f"(sum {t_c + t_d2h:.0f})", flush=True)
    except Exception as exc:
        print(f"copy_to_host_async failed: {exc}", flush=True)

    # parallel chunked upload
    chunks = [np.ascontiguousarray(host12[i]) for i in range(4)]

    def par4():
        futs = [pool.submit(lambda c=c: jax.device_put(c, dev))
                for c in chunks]
        rs = [f.result() for f in futs]
        for r in rs:
            force(r)

    t_p4, _ = med(par4)
    print(f"h2d 12.6 MB 4-way  : {t_p4:7.1f} ms "
          f"({12.6 / t_p4 * 1e3:7.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
