"""TPU training-throughput benchmark: the jitted train step on the real
chip (VERDICT r3 item 5; reference hot loop: train_class_seg per-batch
net(X) → 3 losses → backward → step,
/root/reference/src/classpose/train.py:606-916).

Measures the PRODUCTION step from train/train.py (make_train_step: all 3
losses + uncertainty aggregator + AdamW + donation) on the full ViT-L at
256² crops, sweeping batch size, and reports imgs/s/chip plus model FLOPs
utilization (MFU, 3×forward-FLOPs convention).

Axon note: block_until_ready is a no-op on the tunnel — completion is
forced with a scalar readback of the loss. Run solo.

Usage: python tools/bench_train.py [--batches 4 8 16] [--dtype bfloat16]
"""

import argparse
import json
import time


def vit_l_fwd_flops_per_image(bsize=256, ps=8, depth=24, embed=1024,
                              mlp_ratio=4, neck=256, n_classes=6):
    """Forward FLOPs for one 256² crop (matmuls only, 2·MACs)."""
    L = (bsize // ps) ** 2
    per_tok = (
        3 * embed * embed * 2        # qkv
        + embed * embed * 2          # proj
        + 2 * embed * embed * mlp_ratio * 2  # mlp up+down
    )
    attn = 2 * L * L * embed * 2     # qk + av across heads
    blocks = depth * (L * per_tok + attn)
    patch = L * (3 * ps * ps) * embed * 2
    neck_f = L * (embed * neck + 9 * neck * neck) * 2
    heads = L * neck * (3 + n_classes) * ps * ps * 2
    return blocks + patch + neck_f + heads


V5E_PEAK_BF16 = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--n_classes", type=int, default=6)
    ap.add_argument("--no-pallas-attn", action="store_true",
                    help="A/B: pure-XLA attention end to end (no Pallas "
                    "forward, no recompute backward) — XLA AD saves the "
                    "softmax probs instead of recomputing attention in "
                    "the custom_vjp backward")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from classpose_tpu.nn import ClassTransformer, ClassTransformerConfig
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.train.train import make_train_step

    enable_compilation_cache()
    cfg = ClassTransformerConfig(
        n_cell_classes=args.n_classes, dtype=args.dtype,
        use_pallas_attention=not args.no_pallas_attn,
    )
    net = ClassTransformer(cfg)
    x0 = jnp.zeros((1, 3, cfg.bsize, cfg.bsize), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0)

    tx = optax.adamw(5e-5, weight_decay=0.1)  # reference defaults

    def split_tx():
        def init(t):
            p, lv = t
            return (tx.init(p), tx.init(lv))

        def update(g, s, t=None):
            gp, glv = g
            p, lv = t if t is not None else (None, None)
            up, sp = tx.update(gp, s[0], p)
            ulv, slv = tx.update(glv, s[1], lv)
            return (up, ulv), (sp, slv)

        return optax.GradientTransformation(init, update)

    fwd_flops = vit_l_fwd_flops_per_image(n_classes=args.n_classes)
    rng = np.random.default_rng(0)
    results = {}
    for B in args.batches:
        step = make_train_step(
            net, split_tx(), n_classes=cfg.n_cell_classes,
            seg_trainable=True, use_uncertainty_weighting=True,
        )
        X = jnp.asarray(
            rng.normal(size=(B, 3, cfg.bsize, cfg.bsize))
            .astype(np.float32)
        )
        lbl = np.zeros((B, 4, cfg.bsize, cfg.bsize), np.float32)
        lbl[:, 0] = rng.integers(0, cfg.n_cell_classes,
                                 (B, cfg.bsize, cfg.bsize))
        lbl[:, 1] = rng.random((B, cfg.bsize, cfg.bsize)) > 0.5
        lbl[:, 2:] = (rng.normal(size=(B, 2, cfg.bsize, cfg.bsize))
                      * lbl[:, 1:2])
        lbl = jnp.asarray(lbl)

        # deep-copy: the donated step consumes its param buffers, and
        # jnp.asarray would alias the template tree across batch sizes
        p = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params
        )
        lv = jnp.zeros(3, jnp.float32)
        st = split_tx().init((p, lv))
        key = jax.random.PRNGKey(0)

        t0 = time.time()
        try:
            p, lv, st, key, m = step(p, lv, st, key, X, lbl)
            float(m["total"])  # force completion (readback)
        except Exception as exc:  # OOM at this batch
            results[B] = {"error": str(exc)[:200]}
            print(f"B={B}: {str(exc)[:120]}", flush=True)
            continue
        print(f"B={B}: compile+first step {time.time() - t0:.1f}s",
              flush=True)

        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            p, lv, st, key, m = step(p, lv, st, key, X, lbl)
            float(m["total"])
            ts.append(time.time() - t0)
        ms = float(np.median(ts)) * 1e3
        imgs = B / (ms / 1e3)
        # 3x forward: backward ≈ 2x forward matmul FLOPs
        mfu = 3 * fwd_flops * imgs / V5E_PEAK_BF16
        results[B] = {
            "step_ms": round(ms, 1),
            "imgs_per_sec_per_chip": round(imgs, 2),
            "mfu_vs_bf16_peak": round(mfu, 3),
        }
        print(f"B={B}: {ms:.0f} ms/step = {imgs:.2f} imgs/s/chip "
              f"(MFU {mfu:.1%})", flush=True)

    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip",
        "dtype": args.dtype,
        "fwd_flops_per_img": fwd_flops,
        "results": results,
    }))


if __name__ == "__main__":
    main()
