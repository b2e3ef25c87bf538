"""TPU A/B of the production slide-tile geometry.

The cellpose crop grid (ny = ceil(1.2*S/256), reference core.py:136-149)
over-covers small tiles: at the reference default S=1024 the 5x5 grid of
256^2 crops spends 1.778 crop-px per effective slide px (pipeline stride
S-64), while S=1280 (6x6) spends 1.596, S=1920 (9x9) 1.541 and S=2560
(12x12) 1.514 -- up to 17% less ViT work per slide pixel, the dominant
device cost. Larger tiles also amortize the tunnel's ~90 ms per-call
latency over more pixels. Candidate sizes keep W % 128 == 0 so the
Pallas bounded-displacement sampler stays engaged (ops/sample_pallas.py).

Measures the production fused eval_batch path (structured bench
checkpoint, bf16, two inference threads) at several (tile_size, batch)
points and reports, for each: effective Mpx/s and the 1024-tile
equivalent rate (Mpx_eff / 0.9216), which is directly comparable to
bench.py's tiles/s metric. Windows are interleaved across variants to
decorrelate tunnel drift.
"""

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def main():
    import jax  # noqa: F401

    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    ckpt = Path.home() / ".cache/classpose_tpu/bench_ckpt.npz"
    model = ClassposeModel(pretrained_model=str(ckpt), precision="bf16")

    variants = [
        (1024, 4),
        (1280, 4),
        (1920, 2),
        (2560, 1),
    ]
    env = os.environ.get("CLASSPOSE_GEOM_VARIANTS")
    if env:  # e.g. "1280x4,1920x2"
        variants = [
            tuple(int(v) for v in s.split("x")) for s in env.split(",")
        ]

    rng = np.random.default_rng(0)
    runs = {}
    for S, B in variants:
        tiles = rng.uniform(0, 255, size=(B, S, S, 3)).astype(np.uint8)

        def run(tiles=tiles):
            return model.eval_batch(tiles, batch_size=32, niter=200)

        t0 = time.time()
        try:
            out = run()  # compile + warm
        except Exception as exc:  # e.g. HBM OOM at an untried geometry
            print(
                f"# S={S} B={B}: FAILED ({str(exc)[:200]}) — skipped",
                flush=True,
            )
            continue
        ncells = int(max(m.max() for m, _ in out))
        print(
            f"# S={S} B={B}: warm {time.time()-t0:.1f}s, "
            f"max inst/tile {ncells}",
            flush=True,
        )
        runs[(S, B)] = run

    pool = ThreadPoolExecutor(max_workers=2)
    rates = {k: [] for k in runs}
    for w in range(3):
        for (S, B), run in runs.items():
            # ~20 Mpx of raw tile work per window, whatever the geometry
            n_iters = max(1, int(round(20e6 / (B * S * S))))
            t0 = time.time()
            futs = [pool.submit(run) for _ in range(n_iters)]
            for f in futs:
                f.result()
            dt = time.time() - t0
            eff = n_iters * B * (S - 64) ** 2 / 1e6
            rates[(S, B)].append(eff / dt)
            print(f"# w{w} S={S} B={B}: {eff/dt:.3f} Mpx_eff/s", flush=True)

    for (S, B), r in rates.items():
        mpx = float(np.median(r))
        print(
            json.dumps(
                {
                    "tile_size": S,
                    "tile_batch": B,
                    "mpx_eff_per_s": round(mpx, 4),
                    "tiles1024_eq_per_s": round(mpx / 0.9216, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
