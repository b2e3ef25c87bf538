"""Structured synthetic checkpoints: crafted weights that make the
UNMODIFIED production ClassTransformer emit a designed flow field.

Real published weights are unreachable in this environment (no egress),
and a random init yields zero instances — so load benchmarks and the
multichip dry run would exercise the dynamics/QC/polygon stages at their
data-independent floors. This module constructs weights, for ANY
``ClassTransformerConfig`` geometry, such that:

- patch embed and every transformer block are zero ⇒ the token stream is
  exactly ``pos_embed`` (residual blocks add zero regardless of depth);
- ``pos_embed[t, :neck_dim]`` stores a standardized encoding of the
  ``nout·ps²`` per-token output values (pixel-shuffle channel order),
  plus a ±(Σg)/2 pair and alternating ±a channels so every token has
  EXACT zero mean / unit variance over the neck channels — the neck
  LayerNorm2ds then reduce to the token-independent scale 1/√C, and
  fixed identity/selection convs decode the values;
- the designed field is a period-``period`` grid of radius-``radius``
  cells with cellpose-style 5·unit flows toward each center and ±6
  cellprob (mirroring what real weights produce on dense tissue —
  reference flow semantics at /root/reference/src/classpose/models.py
  compute_masks and cellpose dynamics).

The device program is the production one — only the weights are crafted.
Used by ``tools/make_bench_ckpt.py`` (full ViT-L bench checkpoint) and
``__graft_entry__.dryrun_multichip`` (tiny-geometry correctness check).
"""

from __future__ import annotations

import numpy as np

PERIOD = 32
RADIUS = 13.0


def design_field(
    bsize: int = 256, period: int = PERIOD, radius: float = RADIUS
) -> np.ndarray:
    """(3, bsize, bsize) float32: [flowY, flowX, cellprob] — a periodic
    grid of round cells with unit flows toward each cell center."""
    yy, xx = np.mgrid[0:bsize, 0:bsize].astype(np.float32)
    cy = (np.floor(yy / period) + 0.5) * period
    cx = (np.floor(xx / period) + 0.5) * period
    dy = cy - yy
    dx = cx - xx
    r = np.sqrt(dy * dy + dx * dx)
    inside = r <= radius
    rs = np.maximum(r, 1e-6)
    fy = np.where(inside & (r > 0.5), 5.0 * dy / rs, 0.0)
    fx = np.where(inside & (r > 0.5), 5.0 * dx / rs, 0.0)
    prob = np.where(inside, 6.0, -6.0)
    return np.stack([fy, fx, prob]).astype(np.float32)


def structured_params(
    cfg, period: int = PERIOD, radius: float = RADIUS,
    dominant_class: int = 1,
) -> dict:
    """Build ``{"params": ...}`` for ``ClassTransformer(cfg)`` such that
    ``net.apply`` returns ``design_field(cfg.bsize, period, radius)`` on
    the seg channels (to ~1e-2) and constant ``dominant_class`` logits on
    the class channels, for ANY input.

    Requires ``cfg.neck_dim >= nout·ps² + 4`` (channel budget for the
    encoding + the sum-cancel pair + ≥2 variance top-up channels) and
    ``cfg.neck_dim <= cfg.embed_dim``.
    """
    import jax

    from classpose_tpu.nn.vit_sam import ClassTransformer

    net = ClassTransformer(cfg)
    import jax.numpy as jnp

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
    F = design_field(cfg.bsize, period, radius)  # (3, H, W)
    g = np.zeros((thw, thw, nout * ps * ps), np.float32)
    for c in range(nout):
        blk = F[c].reshape(thw, ps, thw, ps).transpose(0, 2, 1, 3)
        g[..., c * ps * ps:(c + 1) * ps * ps] = blk.reshape(
            thw, thw, ps * ps
        )

    # ---- neck_dim-channel embedding with EXACT per-token stats, so the
    # two LayerNorm2ds reduce to a single fixed scalar the decoder can
    # undo: channels 0:ng carry g; a ±(Σg)/2 pair zeroes the sum;
    # n_top alternating ±a channels top the second moment up to C·D.
    # Every token then has mean 0 and std exactly √C, and
    # standardization is the token-INDEPENDENT scale 1/√C.
    D = cfg.neck_dim
    ng = g.shape[-1]
    n_top = D - ng - 2
    n_top -= n_top % 2  # alternating ± pairs must cancel exactly
    if n_top < 2:
        raise ValueError(
            f"neck_dim={D} too small for ng={ng} (need >= ng+4)"
        )
    if D > cfg.embed_dim:
        raise ValueError("neck_dim must be <= embed_dim")
    emb = np.zeros((thw, thw, D), np.float32)
    emb[..., :ng] = g
    s = g.sum(-1)
    q = (g * g).sum(-1)
    emb[..., ng + n_top] = -s / 2.0
    emb[..., ng + n_top + 1] = -s / 2.0
    # C sized from the worst token's Σ(g²+pair²) with 25% headroom (the
    # ±(Σg)/2 pair dominates for tokens fully inside a cell)
    base = q + (s * s) / 2.0
    C = float(1.25 * base.max() / D)
    need = C * D - base
    if np.any(need <= 0):
        raise ValueError("variance top-up went negative")
    a = np.sqrt(need / n_top)
    alt = np.tile([1.0, -1.0], n_top // 2).astype(np.float32)
    emb[..., ng:ng + n_top] = a[..., None] * alt
    emb /= np.sqrt(C)

    pe = params["encoder"]["pos_embed"]
    pe[0, :, :, :D] = emb

    # restore every LayerNorm scale to 1 so the (unused) normalized
    # activations stay finite
    def fix_ln(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                fix_ln(v)
            elif k in ("scale", "weight") and v.ndim == 1:
                v[...] = 1.0

    fix_ln(params)

    # neck: conv1 selects channels 0:D; conv2 = center-tap identity
    k1 = params["encoder"]["neck_conv1"]["kernel"]  # (1,1,embed,D)
    for i in range(D):
        k1[0, 0, i, i] = 1.0
    k2 = params["encoder"]["neck_conv2"]["kernel"]  # (3,3,D,D)
    for i in range(D):
        k2[1, 1, i, i] = 1.0

    # out head decodes the first ng channels, undoing the √C scale and
    # the two LayerNorm2d eps shrinkages (each divides by √(1+eps·…)≈1)
    ko = params["out"]["kernel"]  # (1,1,D,ng)
    for i in range(ng):
        ko[0, 0, i, i] = np.sqrt(C)

    # class head: constant logits, ``dominant_class`` dominant everywhere
    if cfg.n_cell_classes > 1:
        bo = params["out_class"]["bias"]  # (n_classes*ps*ps,)
        bo[...] = 0.0
        bo[dominant_class * ps * ps:(dominant_class + 1) * ps * ps] = 5.0

    return {"params": params}


def perturbed_structured_params(
    cfg, ripple: float = 0.5, seed: int = 0, **kw
) -> dict:
    """Structured params whose output DEPENDS ON THE INPUT: a small random
    patch embed perturbs the token stream, so the decoded field is the
    designed one plus an input-driven ripple of std ≈ ``ripple``
    DECODED-FIELD units (flows are ±5, cellprob ±6, so the default 0.5
    is a ~10% wobble). Cells stay intact but instance boundaries and
    flow-error QC margins become sensitive to compute precision — the
    workload for the bf16-vs-fp32 drift audit, where the plain structured
    checkpoint would be trivially precision-independent (its blocks are
    zero and every output is a constant decode of pos_embed).

    The kernel std is derived per config: the decoder multiplies token
    channels by √C (the ``out`` kernel diagonal), and a patch conv over
    ``fan_in = 3·ps²`` taps of percentile-normalized input (E[x²]≈1/3)
    amplifies a std-``a`` kernel to token ripple ``a·√(fan_in/3)`` — so
    ``a = ripple / (√C · √(fan_in/3))`` lands the target regardless of
    geometry (a fixed raw std that perturbs a tiny config mildly WIPES
    OUT the full ViT-L, whose √C is ~3x larger)."""
    out = structured_params(cfg, **kw)
    rng = np.random.default_rng(seed)
    pe = out["params"]["encoder"]["patch_embed"]
    sqrtC = float(out["params"]["out"]["kernel"][0, 0, 0, 0])
    fan_in = 3 * cfg.ps * cfg.ps
    a = ripple / (sqrtC * np.sqrt(fan_in / 3.0))
    pe["kernel"] = (
        rng.normal(size=pe["kernel"].shape) * a
    ).astype(np.float32)
    pe["bias"] = np.zeros_like(pe["bias"])
    return out
