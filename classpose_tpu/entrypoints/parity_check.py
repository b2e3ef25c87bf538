"""Real-weight parity harness (``classpose-parity-check``).

Given a published torch checkpoint (cpsam / one of the classpose configs —
reference loads them at models.py:258-345), this runs the full acceptance
gate offline and writes a JSON report:

1. **Conversion**: torch state dict → flax params with a
   self-describing inferred config; unexpected / missing keys reported.
2. **Per-layer fp32 logit parity**: the converted JAX network vs the torch
   replica (:mod:`classpose_tpu.nn.torch_replica`) loaded with the SAME
   weights, compared at patch-embed, every transformer block, the neck,
   the seg/class heads and the final logits (flax
   ``capture_intermediates`` vs torch forward hooks).
3. **End-to-end masks**: ``ClassposeModel.eval`` on a fixed tile set
   (supplied ``--tiles`` or deterministic synthetic H&E-like tiles);
   when ``--reference_masks`` (produced by running the PyTorch reference
   elsewhere) is given, detection F1 / PQ and classification agreement
   are computed with the CoNIC-protocol metrics.

One-command run once the published weights are downloadable::

    classpose-parity-check --checkpoint ~/.classpose_models/conic.pt \
        --reference_masks ref_masks.npy --output parity_report.json

Tested against synthetic checkpoints (tests/test_parity_harness.py).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from classpose_tpu.log import get_logger

logger = get_logger(__name__)


def synthetic_tiles(n: int = 2, size: int = 256, seed: int = 0) -> np.ndarray:
    """Deterministic H&E-like tiles (N, S, S, 3) float32 in 0..255."""
    rng = np.random.default_rng(seed)
    tiles = np.zeros((n, size, size, 3), np.float32)
    yy, xx = np.mgrid[:size, :size]
    for t in range(n):
        img = np.full((size, size, 3), (225.0, 195.0, 215.0), np.float32)
        for _ in range(12):
            cy, cx = rng.integers(16, size - 16, 2)
            r = rng.integers(6, 14)
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            img[m] = (100.0, 60.0, 140.0)
        img += rng.normal(0, 3, img.shape)
        tiles[t] = np.clip(img, 0, 255)
    return tiles


def _align(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Align layouts: try NCHW↔NHWC transposes until shapes agree."""
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    if a.shape == b.shape:
        return a, b
    if a.ndim == 4 and np.transpose(a, (0, 3, 1, 2)).shape == b.shape:
        return np.transpose(a, (0, 3, 1, 2)), b
    if a.ndim == 4 and np.transpose(a, (0, 2, 3, 1)).shape == b.shape:
        return np.transpose(a, (0, 2, 3, 1)), b
    raise ValueError(f"cannot align shapes {a.shape} vs {b.shape}")


def _first_array(x):
    """flax capture_intermediates stores tuples of call outputs."""
    while isinstance(x, (tuple, list)):
        x = x[0]
    return np.asarray(x, np.float32)


def per_layer_parity(sd: dict, params, cfg, x_nchw: np.ndarray) -> dict:
    """Compare torch-replica and flax intermediates on one input."""
    import jax.numpy as jnp
    import torch

    from classpose_tpu.nn import ClassTransformer
    from classpose_tpu.nn.torch_replica import RefClassTransformer

    replica = RefClassTransformer(
        ps=cfg.ps, bsize=cfg.bsize, nout=cfg.nout,
        n_cell_classes=cfg.n_cell_classes,
        structure=cfg.feature_transformation_structure,
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio, neck_dim=cfg.neck_dim,
    )
    load = replica.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False,
    )
    report: dict = {
        "missing_keys": list(load.missing_keys),
        "unexpected_keys": list(load.unexpected_keys),
    }
    replica.eval()

    captured: dict[str, np.ndarray] = {}

    def hook(name):
        def fn(_m, _i, out):
            captured[name] = out.detach().numpy()
        return fn

    handles = [
        replica.encoder.patch_embed.proj.register_forward_hook(
            hook("patch_embed")
        ),
        replica.encoder.register_forward_hook(hook("encoder")),
        replica.out.register_forward_hook(hook("out")),
    ]
    for i, blk in enumerate(replica.encoder.blocks):
        handles.append(blk.register_forward_hook(hook(f"block_{i}")))
    if cfg.n_cell_classes > 1:
        handles.append(
            replica.out_class.register_forward_hook(hook("out_class"))
        )
    with torch.no_grad():
        y_ref = replica(torch.from_numpy(x_nchw)).numpy()
    for h in handles:
        h.remove()

    net = ClassTransformer(cfg)
    (y_jax, _), state = net.apply(
        params, jnp.asarray(x_nchw), capture_intermediates=True
    )
    inter = state["intermediates"]
    enc = inter["encoder"]

    def diff(name, jax_val, ref_val):
        a, b = _align(_first_array(jax_val), np.asarray(ref_val))
        report["layers"][name] = float(np.abs(a - b).max())

    report["layers"] = {}
    diff("patch_embed", enc["patch_embed"]["__call__"],
         captured["patch_embed"])
    for i in range(cfg.depth):
        diff(f"block_{i}", enc[f"blocks_{i}"]["__call__"],
             captured[f"block_{i}"])
    diff("encoder", inter["encoder"]["__call__"], captured["encoder"])
    diff("out", inter["out"]["__call__"], captured["out"])
    if cfg.n_cell_classes > 1:
        diff("out_class", inter["out_class"]["__call__"],
             captured["out_class"])
    a, b = _align(np.asarray(y_jax, np.float32), y_ref)
    report["final_logits_max_diff"] = float(np.abs(a - b).max())
    return report


def detection_f1(gt: np.ndarray, pred: np.ndarray) -> dict:
    """Binary detection PQ/DQ/SQ + precision/recall/F1 at IoU 0.5 (the
    reference's metric of record, metrics/pq.py:95-158)."""
    from classpose_tpu.metrics.pq import compute_binary_pq_metrics

    row = compute_binary_pq_metrics([gt], [pred]).iloc[0]
    return {
        k: float(row[k])
        for k in ("pq", "dq", "sq", "precision", "recall", "f1")
    }


def run_parity(
    checkpoint: str,
    tiles: np.ndarray,
    reference_masks: np.ndarray | None = None,
    reference_class_masks: np.ndarray | None = None,
    atol: float = 2e-4,
    niter: int = 200,
) -> dict:
    from classpose_tpu.nn.convert import (
        _torch_load,
        convert_state_dict,
        infer_config_from_state_dict,
    )
    from classpose_tpu.runner import ClassposeModel

    report: dict = {"checkpoint": str(checkpoint), "atol": atol}

    if str(checkpoint).endswith(".npz"):
        model = ClassposeModel(pretrained_model=str(checkpoint),
                               precision="fp32")
        cfg = model.cfg
        report["per_layer"] = None
        report["note"] = (
            ".npz checkpoint: conversion already done; per-layer torch "
            "parity requires the original torch .pt"
        )
    else:
        sd = _torch_load(str(checkpoint))
        sd = {k: np.asarray(v) for k, v in sd.items()}
        cfg = infer_config_from_state_dict(sd)
        params = convert_state_dict(sd)
        model = ClassposeModel(cfg=cfg, params=params, precision="fp32")

        # key/shape diff vs the hand-transcribed published-checkpoint
        # manifest (nn/manifest.py) — the independent offline anchor a
        # real-weight run verifies first (VERDICT r4 item 8). Only the
        # published ViT-L conv-head geometry has a manifest; other
        # geometries (synthetic test checkpoints, UNet heads) note why.
        from classpose_tpu.nn.manifest import manifest_diff, vit_l_manifest

        if (
            cfg.depth == 24 and cfg.bsize == 256
            and not cfg.feature_transformation_structure
        ):
            report["manifest_diff"] = manifest_diff(
                sd, vit_l_manifest(cfg.n_cell_classes)
            )
        else:
            report["manifest_diff"] = {
                "skipped": "no published-checkpoint manifest for this "
                "geometry (ViT-L conv-head only)"
            }

        try:
            import torch  # noqa: F401

            x = np.ascontiguousarray(
                (tiles[:1] / 255.0).transpose(0, 3, 1, 2), np.float32
            )
            report["per_layer"] = per_layer_parity(sd, params, cfg, x)
            report["logit_parity_pass"] = bool(
                report["per_layer"]["final_logits_max_diff"] <= atol
            )
        except ImportError:
            report["per_layer"] = None
            report["note"] = "torch unavailable — skipped per-layer parity"

    report["config"] = {
        "n_cell_classes": cfg.n_cell_classes,
        "structure": cfg.feature_transformation_structure,
        "bsize": cfg.bsize, "depth": cfg.depth,
    }

    masks_out, class_out = [], []
    for t in tiles:
        m, _flows, cm, _ = model.eval(
            t.astype(np.float32), niter=niter, batch_size=4
        )
        masks_out.append(np.asarray(m, np.int32))
        class_out.append(np.asarray(cm, np.int32))
    report["n_cells_per_tile"] = [int(m.max()) for m in masks_out]

    if reference_masks is not None:
        f1s = [
            detection_f1(g.astype(np.int32), p)
            for g, p in zip(reference_masks, masks_out)
        ]
        report["detection"] = {
            k: float(np.mean([f[k] for f in f1s])) for k in f1s[0]
        }
        if reference_class_masks is not None and cfg.n_cell_classes > 1:
            agree = []
            for gcm, pcm, pm in zip(
                reference_class_masks, class_out, masks_out
            ):
                fg = (pm > 0) & (gcm > 0)
                agree.append(
                    float((gcm[fg] == pcm[fg]).mean()) if fg.any() else 1.0
                )
            report["classification_pixel_agreement"] = float(
                np.mean(agree)
            )
    return report


def main_with_args(argv=None):
    p = argparse.ArgumentParser(
        description="fp32 parity gate: converted JAX model vs the torch "
        "checkpoint (per-layer logits + end-to-end masks)."
    )
    p.add_argument("--checkpoint", required=True,
                   help="torch .pt/.pth state dict or converted .npz — or "
                   "a DIRECTORY of checkpoints, validated in one run with "
                   "a consolidated report (so the moment real published "
                   "weights are reachable, the full validation is one "
                   "command)")
    p.add_argument("--tiles", default=None,
                   help=".npy (N,H,W,3) fixed tile set; default synthetic")
    p.add_argument("--n_tiles", type=int, default=2)
    p.add_argument("--tile_size", type=int, default=256)
    p.add_argument("--reference_masks", default=None,
                   help=".npy (N,H,W) int masks from the torch reference")
    p.add_argument("--reference_class_masks", default=None)
    p.add_argument("--output", default="parity_report.json")
    p.add_argument("--atol", type=float, default=2e-4)
    p.add_argument("--niter", type=int, default=200)
    args = p.parse_args(argv)

    tiles = (
        np.load(args.tiles).astype(np.float32)
        if args.tiles
        else synthetic_tiles(args.n_tiles, args.tile_size)
    )
    ref = np.load(args.reference_masks) if args.reference_masks else None
    refc = (
        np.load(args.reference_class_masks)
        if args.reference_class_masks else None
    )

    def summarize(rep):
        return {
            "final_logits_max_diff": (
                rep.get("per_layer") or {}
            ).get("final_logits_max_diff"),
            "logit_parity_pass": rep.get("logit_parity_pass"),
            "detection_f1": (rep.get("detection") or {}).get("f1"),
        }

    ckpt = Path(args.checkpoint)
    if ckpt.is_dir():
        # consolidated multi-checkpoint run (VERDICT r2 item 10)
        paths = sorted(
            p for p in ckpt.iterdir()
            if p.suffix in (".pt", ".pth", ".npz")
        )
        if not paths:
            raise SystemExit(f"no .pt/.pth/.npz checkpoints in {ckpt}")
        report = {"checkpoints": {}, "summary": {}}
        for pth in paths:
            logger.info("parity-checking %s", pth.name)
            try:
                rep = run_parity(
                    str(pth), tiles, reference_masks=ref,
                    reference_class_masks=refc, atol=args.atol,
                    niter=args.niter,
                )
            except Exception as exc:  # keep going; report the failure
                rep = {"error": f"{type(exc).__name__}: {exc}"}
            report["checkpoints"][pth.name] = rep
            report["summary"][pth.name] = (
                summarize(rep) if "error" not in rep
                else {"error": rep["error"]}
            )
        summary = report["summary"]
    else:
        report = run_parity(
            str(ckpt), tiles, reference_masks=ref,
            reference_class_masks=refc, atol=args.atol, niter=args.niter,
        )
        summary = summarize(report)
    Path(args.output).write_text(json.dumps(report, indent=2, default=str))
    logger.info("parity report → %s", args.output)
    print(json.dumps(summary))
    return report


def main():  # console script
    main_with_args()


if __name__ == "__main__":
    main()
