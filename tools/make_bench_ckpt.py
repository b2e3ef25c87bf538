"""Build a STRUCTURED synthetic checkpoint for honest load benchmarks.

Real published weights are unreachable here (no egress), and a random
init yields zero instances — so the slide-scale benchmark's dynamics/QC
run at their data-dependent floors and the host polygon stages idle
(ROADMAP "bench content" gap). This tool constructs ViT-L weights that
make the UNMODIFIED production network emit a designed flow field:

- patch embed and every transformer block are zero ⇒ the token stream is
  exactly ``pos_embed`` (residual blocks add zero);
- ``pos_embed[t, :256]`` stores a standardized encoding of the 192
  per-token output values (3 seg channels x 8x8 pixel-shuffle offsets),
  padded on channels 192:256 so every token has EXACT zero mean / unit
  variance — the neck LayerNorm2ds are then (up to their 1e-6 eps)
  identities, and fixed identity/selection convs decode the values;
- the designed field is a period-32 grid of radius-13 cells with
  cellpose-style 5·unit flows toward each center and ±6 cellprob. 32
  divides both the 192 px net-tile stride and the 960 px slide-tile
  stride, so overlapping tiles see phase-ALIGNED patterns and blending
  is seam-free: ~1024 instances per 1024² tile, QC diffusion horizon 64
  (above the 40-iteration floor), full host polygon/dedup load.

The device program is the production one — only the weights are crafted.

Usage: python tools/make_bench_ckpt.py --out bench_ckpt.npz [--verify]
"""

import argparse

import numpy as np


PERIOD = 32
RADIUS = 13.0


def design_field(bsize: int = 256):
    """(3, bsize, bsize) float32: [flowY, flowX, cellprob]."""
    yy, xx = np.mgrid[0:bsize, 0:bsize].astype(np.float32)
    cy = (np.floor(yy / PERIOD) + 0.5) * PERIOD
    cx = (np.floor(xx / PERIOD) + 0.5) * PERIOD
    dy = cy - yy
    dx = cx - xx
    r = np.sqrt(dy * dy + dx * dx)
    inside = r <= RADIUS
    rs = np.maximum(r, 1e-6)
    fy = np.where(inside & (r > 0.5), 5.0 * dy / rs, 0.0)
    fx = np.where(inside & (r > 0.5), 5.0 * dx / rs, 0.0)
    prob = np.where(inside, 6.0, -6.0)
    return np.stack([fy, fx, prob]).astype(np.float32)


def build_params(cfg):
    import jax
    import jax.numpy as jnp

    from classpose_tpu.nn.vit_sam import ClassTransformer

    net = ClassTransformer(cfg)
    x0 = jnp.zeros((1, 3, cfg.bsize, cfg.bsize), jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x0)
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )["params"]

    thw = cfg.tokens_hw
    ps = cfg.ps
    nout = cfg.nout

    # ---- per-token targets g_t: (thw, thw, nout*ps*ps) in pixel-shuffle
    # channel order c*ps*ps + dy*ps + dx
    F = design_field(cfg.bsize)  # (3, H, W)
    g = np.zeros((thw, thw, nout * ps * ps), np.float32)
    for c in range(nout):
        blk = F[c].reshape(thw, ps, thw, ps).transpose(0, 2, 1, 3)
        g[..., c * ps * ps:(c + 1) * ps * ps] = blk.reshape(
            thw, thw, ps * ps
        )

    # ---- 256-channel embedding with EXACT per-token stats, so the two
    # LayerNorm2ds reduce to a single fixed scalar the decoder can undo:
    # channels 0:192 carry g; a ±(Σg)/2 pair zeroes the sum; 60
    # alternating ±a channels top the second moment up to C·D. Every
    # token then has mean 0 and std exactly √C, and standardization is
    # the token-INDEPENDENT scale 1/√C.
    D = cfg.neck_dim  # 256
    ng = g.shape[-1]  # 192
    emb = np.zeros((thw, thw, D), np.float32)
    emb[..., :ng] = g
    s = g.sum(-1)
    q = (g * g).sum(-1)
    emb[..., ng + 60] = -s / 2.0
    emb[..., ng + 61] = -s / 2.0
    # C sized from the worst token's Σ(g²+pair²) with 25% headroom (the
    # ±(Σg)/2 pair dominates for tokens fully inside a cell)
    base = q + (s * s) / 2.0
    C = float(1.25 * base.max() / D)
    need = C * D - base
    if np.any(need <= 0):
        raise ValueError("variance top-up went negative")
    a = np.sqrt(need / 60.0)
    alt = np.tile([1.0, -1.0], 30).astype(np.float32)
    emb[..., ng:ng + 60] = a[..., None] * alt
    emb /= np.sqrt(C)

    pe = params["encoder"]["pos_embed"]
    pe[0, :, :, :D] = emb
    # LN scales default to ones in the zero tree? they were zeroed —
    # restore every LayerNorm scale to 1 so the (unused) normalized
    # activations stay finite
    def fix_ln(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                fix_ln(v)
            elif k in ("scale", "weight") and v.ndim == 1:
                v[...] = 1.0

    fix_ln(params)

    # neck: conv1 selects channels 0:256; conv2 = center-tap identity
    k1 = params["encoder"]["neck_conv1"]["kernel"]  # (1,1,1024,256)
    for i in range(D):
        k1[0, 0, i, i] = 1.0
    k2 = params["encoder"]["neck_conv2"]["kernel"]  # (3,3,256,256)
    for i in range(D):
        k2[1, 1, i, i] = 1.0

    # out head decodes the first 192 channels, undoing the √C scale and
    # the two LayerNorm2d eps shrinkages (each divides by √(1+eps·…)≈1)
    ko = params["out"]["kernel"]  # (1,1,256,192)
    for i in range(ng):
        ko[0, 0, i, i] = np.sqrt(C)

    # class head: constant logits, class 1 dominant everywhere
    if cfg.n_cell_classes > 1:
        bo = params["out_class"]["bias"]  # (n_classes*ps*ps,)
        bo[...] = 0.0
        bo[1 * ps * ps:2 * ps * ps] = 5.0

    return {"params": params}


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
