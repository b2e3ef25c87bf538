"""Per-pass adaptive-range census of the follow_flows composition at the
bench load (design-field content, 8x1024²).

For every sampling pass of the niter=200 binary composition this prints
the REAL per-stripe offset ranges (what sizes the Pallas sampler's
loops) at several stripe heights R, plus the honest per-pass wall when
composed with the true intermediate fields — the r5 ROADMAP numbers
aggregate all passes into one 366 ms figure; this splits it so the
optimization target is visible (and shows whether a smaller R — tighter
ranges, more halo DMA — would pay).

Run SOLO on the TPU.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def med(f, n=5):
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
    from classpose_tpu.dynamics.masks import STEP_CAP, _sample_static
    from classpose_tpu.ops.sample_pallas import (
        _pick_row_block,
        _stripe_bounds,
    )

    enable_compilation_cache()
    B, H, W = 8, 1024, 1024
    f = design_field(256)
    f = np.tile(f, (1, H // 256, W // 256))
    dP = jnp.asarray(np.broadcast_to(f[None, :2], (B, 2, H, W)).copy())
    iscell = jnp.asarray(np.broadcast_to(f[2] > 0, (B, H, W)).copy())

    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[None]
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[None]
    u = (dP * iscell[:, None].astype(dP.dtype) / 5.0).astype(jnp.float32)
    u = jnp.clip(u, -STEP_CAP, STEP_CAP)
    u = jnp.stack(
        [jnp.clip(gy + u[:, 0], 0.0, H - 1.0) - gy,
         jnp.clip(gx + u[:, 1], 0.0, W - 1.0) - gx], axis=1)

    def clip_disp(dy, dx):
        return jnp.stack(
            [jnp.clip(gy + dy, 0.0, H - 1.0) - gy,
             jnp.clip(gx + dx, 0.0, W - 1.0) - gx], axis=1)

    def census(tag, uu, py, px, bound):
        D = int(np.ceil(bound)) + 1
        Dh = -(-D // 8) * 8
        samp = jax.jit(
            lambda a, b, c: _sample_static(a, b, c, bound)
        )
        samp(uu, py, px)
        ms = med(lambda: force(samp(uu, py, px)))
        line = f"{tag:22s} bound={bound:6.1f} D={D:3d}: {ms:6.1f} ms |"
        for R in (128, 64, 32, 16):
            if H % R or H < R + 2 * Dh:
                line += f" R{R}: n/a"
                continue
            bs = np.asarray(_stripe_bounds(py, px, H, W, R, D))
            n_d = bs[:, :, 1] + 2 - bs[:, :, 0]
            n_x = bs[:, :, 3] + 1 - bs[:, :, 2]
            work = (n_d * n_x).astype(np.float64)
            line += (f" R{R}: nd{n_d.mean():5.1f}/{n_d.max():3d}"
                     f" nx{n_x.mean():5.1f}/{n_x.max():3d}"
                     f" w{work.mean():7.1f}")
        picked = _pick_row_block(H, W, Dh, 2)
        print(line + f" | picked R={picked}", flush=True)

    # replicate follow_flows_batched(niter=200) exactly
    niter = 200
    r = None
    bound_u, bound_r = float(STEP_CAP), 0.0
    big = float(max(H, W))
    k_max = niter.bit_length() - 1
    for k in range(k_max + 1):
        if (niter >> k) & 1:
            if r is None:
                r = u
                bound_r = bound_u
            else:
                census(f"combine k={k}", u, gy + r[:, 0], gx + r[:, 1],
                       bound_r)
                s = _sample_static(u, gy + r[:, 0], gx + r[:, 1], bound_r)
                r = clip_disp(r[:, 0] + s[:, 0], r[:, 1] + s[:, 1])
                bound_r = min(bound_r + bound_u, big)
        if k < k_max:
            census(f"square k={k}", u, gy + u[:, 0], gx + u[:, 1],
                   bound_u)
            s = _sample_static(u, gy + u[:, 0], gx + u[:, 1], bound_u)
            u = clip_disp(u[:, 0] + s[:, 0], u[:, 1] + s[:, 1])
            bound_u = min(2.0 * bound_u, big)


if __name__ == "__main__":
    main()
