"""Sub-stage breakdown of the post-forward dynamics on the TPU.

Times, at the production 8x1024² bf16 load with REALISTIC content (the
design_field cell grid the structured bench checkpoint emits — ~1024
instances/tile), each stage and sub-stage:

  follow_flows(200)
  get_masks: histogram | +seeds | +rank | +basins | +gather (incremental)
  qc_fused  at window {512, 256, 128} x K {4096, 2048}

Each timing forces completion with a small readback (jax.block_until_ready
is a no-op on the axon tunnel). Run SOLO — any concurrent process distorts
the 1-CPU host.
"""

import os
import time

import numpy as np

os.environ.setdefault("CLASSPOSE_BENCH_TILE_BATCH", "8")

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
    from classpose_tpu.dynamics.masks import (
        follow_flows_batched,
        get_masks_from_positions_batched,
        qc_filter_masks_fused,
        _cumsum_seeds,
    )

    enable_compilation_cache()
    B, H, W = int(os.environ["CLASSPOSE_BENCH_TILE_BATCH"]), 1024, 1024

    # realistic content: tile the 256² design field to 1024² → 1024
    # cells/tile of radius 13 with cellpose-style flows (what the
    # structured bench ckpt makes the net emit)
    f = design_field(256)
    f = np.tile(f, (1, H // 256, W // 256))
    dP = jnp.asarray(np.broadcast_to(f[None, :2], (B, 2, H, W)).copy())
    iscell = jnp.asarray(
        np.broadcast_to(f[2] > 0, (B, H, W)).copy()
    )

    # ---------------- follow_flows ----------------
    ff = jax.jit(lambda d, i: follow_flows_batched(d, i, niter=200))
    p = ff(dP, iscell)
    print(f"follow_flows(200)      : {med(lambda: force(ff(dP, iscell))):7.1f} ms")

    # ---------------- get_masks sub-stages ----------------
    fy = jnp.clip(jnp.round(p[:, 0]), 0, H - 1).astype(jnp.int32)
    fx = jnp.clip(jnp.round(p[:, 1]), 0, W - 1).astype(jnp.int32)
    cellf = iscell.astype(jnp.float32)

    def hist(fy, fx, cellf):
        flat = (fy * W + fx).reshape(B, H * W)
        return jax.vmap(
            lambda f, c: jnp.zeros(H * W, jnp.float32).at[f].add(c)
        )(flat, cellf.reshape(B, H * W)).reshape(B, H, W)

    j_h = jax.jit(hist)
    h = j_h(fy, fx, cellf)
    print(f"  histogram (scatter)  : {med(lambda: force(j_h(fy, fx, cellf))):7.1f} ms")

    def seeds_of(h):
        hmax = jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, 5, 5), (1, 1, 1), "SAME"
        )
        return (h >= hmax) & (h > 10.0)

    j_s = jax.jit(lambda h: seeds_of(h))
    seeds = j_s(h)
    print(f"  seeds (reduce_window): {med(lambda: force(j_s(h))):7.1f} ms")

    j_r = jax.jit(lambda s: _cumsum_seeds(s, H, W))
    rank = j_r(seeds)
    print(f"  rank (cumsum)        : {med(lambda: force(j_r(seeds))):7.1f} ms")

    def basins(seeds, rank, h):
        seed_lab = jnp.where(seeds, rank, 0)
        grow = h > 2.0

        def body(_, lab):
            lab_max = jax.lax.reduce_window(
                lab, 0, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
            )
            lab = jnp.where(grow & (lab == 0), lab_max, lab)
            return jnp.where(seeds, seed_lab, lab)

        return jax.lax.fori_loop(0, 5, body, seed_lab)

    j_b = jax.jit(basins)
    lab = j_b(seeds, rank, h)
    print(f"  basins (5x rw3)      : {med(lambda: force(j_b(seeds, rank, h))):7.1f} ms")

    def final(lab, fy, fx, iscell):
        flat = (fy * W + fx).reshape(B, H * W)
        m = jax.vmap(lambda l, f: l.ravel()[f])(lab, flat).reshape(B, H, W)
        return jnp.where(iscell, m, 0)

    j_f = jax.jit(final)
    print(f"  final gather         : {med(lambda: force(j_f(lab, fy, fx, iscell))):7.1f} ms")

    j_gm = jax.jit(
        lambda pp, ii: get_masks_from_positions_batched(
            pp, ii, return_seeds=True
        )
    )
    raw, sl = j_gm(p, iscell)
    print(f"get_masks (full)       : {med(lambda: force(j_gm(p, iscell)[0])):7.1f} ms")
    n_inst = int(jnp.max(sl))
    print(f"  (instances/tile max id: {n_inst})")

    # ---------------- QC variants ----------------
    for K in (4096, 2048):
        for win in (512, 256, 128):
            j_qc = jax.jit(
                lambda r, d, K=K, win=win: jax.vmap(
                    lambda a, b: qc_filter_masks_fused(
                        a, b, flow_threshold=0.4, max_size_fraction=0.4,
                        max_instances=K, dense_output=True,
                        window=win, return_window_ok=True,
                    )
                )(r, d)
            )
            o, ok = j_qc(raw, dP)
            t = med(lambda: force(j_qc(raw, dP)[0]))
            print(
                f"qc_fused K={K:4d} w={win:3d}: {t:7.1f} ms"
                f"  (window_ok={bool(jnp.all(ok))})"
            )


if __name__ == "__main__":
    main()
