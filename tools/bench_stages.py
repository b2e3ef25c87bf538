"""Split eval_batch wall time into transfer vs compute on the axon tunnel.

Measures, with readback-forced completion (CLAUDE.md axon ground rules):
  1. pure h2d of the uint8 tile batch
  2. pure d2h of the int16/int8 outputs
  3. the full fused program with device-resident input and a tiny readback
     (compute only)
  4. the production eval_batch call (h2d + compute + full d2h)
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


def main():
    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    cfg = ClassTransformerConfig(n_cell_classes=6, dtype="bfloat16")
    model = ClassposeModel(cfg=cfg, precision="bf16")

    rng = np.random.default_rng(0)
    B = 4
    tiles = rng.uniform(0, 255, size=(B, 1024, 1024, 3)).astype(np.uint8)

    # warm the program + get handles to the compiled runner
    model.eval_batch(tiles, batch_size=32, niter=200)
    (key, (runner, _)), = [
        (k, v) for k, v in model._runners.items() if k[0] == "fused"
    ]

    xt_dev = jnp.asarray(tiles)
    float(jnp.sum(xt_dev[0, :2, 0, 0].astype(jnp.float32)))  # settle

    def h2d():
        x = jnp.asarray(tiles)
        float(jnp.sum(x[-1, -1, -8:, 0].astype(jnp.float32)))

    def compute_only():
        buf = runner(xt_dev)  # ONE packed uint8 buffer
        # tiny readback forces completion of the (single) output buffer
        float(jnp.sum(buf[:, -8:].astype(jnp.float32)))

    out = runner(xt_dev)

    def d2h():
        np.asarray(out)

    def full():
        model.eval_batch(tiles, batch_size=32, niter=200)

    t_h2d = med(h2d)
    t_comp = med(compute_only)
    t_d2h = med(d2h)
    t_full = med(full)
    in_mb = tiles.nbytes / 1e6
    out_mb = out.nbytes / 1e6
    print(f"h2d  {in_mb:6.1f} MB: {t_h2d:7.1f} ms "
          f"({in_mb / t_h2d * 1e3:6.1f} MB/s)")
    print(f"comp            : {t_comp:7.1f} ms")
    print(f"d2h  {out_mb:6.1f} MB: {t_d2h:7.1f} ms "
          f"({out_mb / t_d2h * 1e3:6.1f} MB/s)")
    print(f"full eval_batch : {t_full:7.1f} ms "
          f"(sum of parts {t_h2d + t_comp + t_d2h:7.1f} ms)")


if __name__ == "__main__":
    main()
