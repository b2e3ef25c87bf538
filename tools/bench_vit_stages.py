"""Time the forward-side stages standalone on the TPU: normalize,
make_tiles, the ViT-L forward (100x256^2 net tiles), and the blend."""

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
    from classpose_tpu.ops.normalize import normalize_img
    from classpose_tpu.ops.tiles import (
        average_tiles_separable,
        compute_tile_grid,
        make_tiles,
    )

    enable_compilation_cache()
    cfg = ClassTransformerConfig(n_cell_classes=6, dtype="bfloat16")
    model = ClassposeModel(cfg=cfg, precision="bf16")

    rng = np.random.default_rng(0)
    B = 4
    x_dev = jnp.asarray(
        rng.uniform(0, 255, size=(B, 1024, 1024, 3)).astype(np.uint8)
    )
    grid = compute_tile_grid(1024, 1024, 256, 0.1, False)
    nt = grid.ntiles

    @jax.jit
    def norm_tiles(x):
        def per(img):
            img = normalize_img(
                img.astype(jnp.float32), axis=-1, integral_stats=True
            )
            chw = jnp.transpose(img, (2, 0, 1))
            return make_tiles(chw, grid)
        return jax.vmap(per)(x)

    t_prep = med(lambda: float(jnp.sum(norm_tiles(x_dev)[0, 0, 0, 0, :8])))
    tiles = norm_tiles(x_dev)  # (B, nt, 3, 256, 256)

    @jax.jit
    def fwd(t):
        def one(chunk):
            y, _ = model._apply(chunk)
            return y
        return jax.vmap(one)(t)

    t_fwd = med(lambda: float(
        jnp.sum(fwd(tiles)[0, 0, 0, 0, :8].astype(jnp.float32))
    ))
    y = fwd(tiles)  # (B, nt, 9, 256, 256)

    @jax.jit
    def blend(y):
        def one(yt):
            return average_tiles_separable(yt, grid)
        return jax.vmap(one)(y)

    t_blend = med(lambda: float(
        jnp.sum(blend(y)[0, 0, 0, :8].astype(jnp.float32))
    ))

    print(f"normalize+make_tiles: {t_prep:7.1f} ms")
    print(f"ViT fwd ({B}x{nt})    : {t_fwd:7.1f} ms")
    print(f"blend               : {t_blend:7.1f} ms")


if __name__ == "__main__":
    main()
