"""TPU A/B: get_masks_from_positions_batched Pallas kernels vs XLA
scatter/gather, on realistic converged positions (synthetic disks).

Interleaved wall medians with readback + equality check (the two paths
must be bit-exact)."""

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


def main():
    from classpose_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    import os

    from classpose_tpu.dynamics.flows import masks_to_flows
    from classpose_tpu.dynamics import masks as M

    H = W = 1024
    B = 4
    rng = np.random.default_rng(0)
    gt = np.zeros((H, W), np.int32)
    k = 0
    for gy in range(24, H - 24, 48):
        for gx in range(24, W - 24, 48):
            k += 1
            r = int(rng.integers(12, 20))
            yy, xx = np.ogrid[-r:r + 1, -r:r + 1]
            disk = (yy * yy + xx * xx) <= r * r
            gt[gy - r:gy + r + 1, gx - r:gx + r + 1][disk] = k
    print(f"{k} instances/tile")
    mu = np.asarray(masks_to_flows(gt))
    dP = np.broadcast_to(
        (5.0 * mu).astype(np.float32), (B, 2, H, W)
    ).copy()
    iscell = np.broadcast_to(gt > 0, (B, H, W)).copy()

    p = M.follow_flows_batched(
        jnp.asarray(dP), jnp.asarray(iscell), niter=200
    )
    p.block_until_ready()
    ic = jnp.asarray(iscell)

    results = {}
    for mode in ("off", "on"):
        os.environ["CLASSPOSE_PALLAS_SAMPLER"] = mode
        jax.clear_caches()

        def run():
            r = M.get_masks_from_positions_batched(p, ic)
            return float(jnp.sum(r[:, ::101, ::101].astype(jnp.float32)))

        t = med(run)
        results[mode] = (t, np.asarray(
            M.get_masks_from_positions_batched(p, ic)))
        print(f"get_masks mode={mode}: {t:7.1f} ms wall", flush=True)
    del os.environ["CLASSPOSE_PALLAS_SAMPLER"]

    a, b = results["off"][1], results["on"][1]
    print("bit-equal:", bool(np.array_equal(a, b)),
          "| instances recovered:", len(np.unique(a)) - 1)

    # second A/B: MXU-blocked seed-rank scan vs jnp.cumsum (within the
    # winning sampler mode) — also bit-exact by construction
    cres = {}
    for mode in ("0", "1"):
        os.environ["CLASSPOSE_MXU_CUMSUM"] = mode
        jax.clear_caches()

        def run():
            r = M.get_masks_from_positions_batched(p, ic)
            return float(jnp.sum(r[:, ::101, ::101].astype(jnp.float32)))

        t = med(run)
        cres[mode] = (t, np.asarray(
            M.get_masks_from_positions_batched(p, ic)))
        print(f"get_masks mxu_cumsum={mode}: {t:7.1f} ms wall", flush=True)
    del os.environ["CLASSPOSE_MXU_CUMSUM"]
    print("cumsum bit-equal:",
          bool(np.array_equal(cres["0"][1], cres["1"][1])))


if __name__ == "__main__":
    main()
