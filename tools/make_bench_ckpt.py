"""Build a STRUCTURED synthetic checkpoint for honest load benchmarks.

Real published weights are unreachable here (no egress), and a random
init yields zero instances — so the slide-scale benchmark's dynamics/QC
run at their data-dependent floors and the host polygon stages idle
(ROADMAP "bench content" gap). This tool writes ViT-L weights (built by
classpose_tpu.nn.synthetic.structured_params) that make the UNMODIFIED
production network emit a designed flow field: a period-32 grid of
radius-13 cells with cellpose-style 5·unit flows toward each center and
±6 cellprob. 32 divides both the 192 px net-tile stride and the 960 px
slide-tile stride, so overlapping tiles see phase-ALIGNED patterns and
blending is seam-free: ~1024 instances per 1024² tile, QC diffusion
horizon 64 (above the 40-iteration floor), full host polygon/dedup load.

The device program is the production one — only the weights are crafted.

Usage: python tools/make_bench_ckpt.py --out bench_ckpt.npz [--verify]
"""

import argparse

import numpy as np

from classpose_tpu.nn.synthetic import (  # noqa: F401 (re-exports)
    PERIOD,
    RADIUS,
    design_field,
    structured_params as build_params,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_ckpt.npz")
    ap.add_argument("--n_classes", type=int, default=6)
    ap.add_argument("--verify", action="store_true",
                    help="run the real net fp32 on one 256² tile and "
                    "check the decoded field (CPU-ok, ~1 min)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.nn.convert import save_params

    cfg = ClassTransformerConfig(
        n_cell_classes=args.n_classes, dtype="float32"
    )
    params = build_params(cfg)
    save_params(params, args.out, cfg)
    print(f"wrote {args.out}")

    if args.verify:
        import jax.numpy as jnp

        from classpose_tpu.nn.vit_sam import ClassTransformer

        net = ClassTransformer(cfg)
        x = jnp.zeros((1, 3, cfg.bsize, cfg.bsize), jnp.float32)
        out, _ = jax.jit(net.apply)(
            {"params": params["params"]}, x
        )
        out = np.asarray(out)[0]
        Fd = design_field(cfg.bsize)
        seg = out[args.n_classes:] if args.n_classes > 1 else out
        err = np.abs(seg - Fd).max()
        cls = out[:args.n_classes].argmax(0)
        print(f"decoded field max|err| = {err:.4f} "
              f"(flows ±5, prob ±6); class argmax unique: "
              f"{np.unique(cls)}")
        assert err < 0.05, "decoding drifted — check the construction"


if __name__ == "__main__":
    main()
