"""Semantic Cellpose-SAM baseline (TPU-native).

Functional equivalent of the reference's paper baseline
(/root/reference/paper_experiments/run_cellpose_semantic.py, itself an
adaptation of the cellpose cpsam semantic experiment): a plain
Cellpose-SAM transformer whose class maps are grafted onto the pretrained
``out`` head — background initialized as −0.5 × the cellprob readout
weights, each nucleus class as +0.5 × them (reference
``initialize_class_net``, run_cellpose_semantic.py:103-141) — trained
with the cellpose seg loss + class CE with inverse-frequency class
weights, and evaluated by per-pixel argmax.

In the TPU build the class maps live in the dedicated ``out_class`` 1×1
conv head (mathematically identical to the reference's widened ``out``
conv: both are 1×1 convs on the 256-ch neck features followed by the
frozen pixel-shuffle readout), so the graft initializes ``out_class``
from the converted cpsam ``out`` weights.

Usage mirrors the reference:
  python paper_experiments/run_cellpose_semantic.py \
      --train_data_path train_x.npy --train_labels_path train_y.npy \
      --test_data_path test_x.npy --dataset_name lizard \
      --out_path preds.npy [--skip_training] [--epochs 500] \
      [--pretrained cpsam.npz]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def rescale_ratio(training_to_inference_mpp: str) -> float:
    """Parse the reference's "train_mpp:infer_mpp" (or plain ratio)
    string (run_cellpose_semantic.py:36-47)."""
    if not training_to_inference_mpp:
        return 1.0
    if ":" in training_to_inference_mpp:
        t, i = training_to_inference_mpp.split(":")
        return float(i) / float(t) if float(t) != float(i) else 1.0
    return float(training_to_inference_mpp)


def rescale_if_necessary(image: np.ndarray, spec: str) -> np.ndarray:
    import cv2

    ratio = rescale_ratio(spec)
    if ratio == 1.0:
        return image
    new = (
        int(round(image.shape[1] / ratio)),
        int(round(image.shape[0] / ratio)),
    )
    return cv2.resize(image, new, interpolation=cv2.INTER_LINEAR)


def rescale_label_if_necessary(label: np.ndarray,
                               new_sh: tuple[int, int]) -> np.ndarray:
    import cv2

    if label.shape[:2] == tuple(new_sh):
        return label
    return cv2.resize(
        label.astype(np.int32), (new_sh[1], new_sh[0]),
        interpolation=cv2.INTER_NEAREST,
    )


def build_semantic_model(nclasses: int, pretrained: str | None,
                         precision: str = "fp32", tiny: bool = False):
    """ClassTransformer with the class head grafted from the pretrained
    cellprob readout (reference initialize_class_net semantics)."""
    import jax.numpy as jnp

    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.runner import ClassposeModel

    if tiny:  # testing escape hatch (same as run_training --tiny_model)
        cfg = ClassTransformerConfig(
            n_cell_classes=nclasses, embed_dim=32, depth=1, num_heads=2,
            neck_dim=16, bsize=64,
        )
    else:
        cfg = ClassTransformerConfig(n_cell_classes=nclasses)
    model = ClassposeModel(
        cfg=cfg, pretrained_model=pretrained, precision=precision,
    )
    params = model.params["params"]
    out_k = np.asarray(params["out"]["kernel"])  # (1, 1, 256, 3·ps²)
    out_b = np.asarray(params["out"]["bias"])
    ps2 = cfg.ps ** 2
    # cellprob block = last ps² output channels of `out`
    wc = out_k[..., 2 * ps2: 3 * ps2]
    bc = out_b[2 * ps2: 3 * ps2]
    ck = np.concatenate(
        [-0.5 * wc] + [0.5 * wc] * (nclasses - 1), axis=-1
    )
    cb = np.concatenate([bc] * nclasses, axis=-1)
    params["out_class"]["kernel"] = jnp.asarray(ck)
    params["out_class"]["bias"] = jnp.asarray(cb)
    return model


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--train_data_path", type=str, default="")
    p.add_argument("--train_labels_path", type=str, default="")
    p.add_argument("--test_data_path", type=str, default="")
    p.add_argument("--dataset_name", type=str, default="")
    p.add_argument("--out_path", type=str, default="preds.npy")
    p.add_argument("--training_to_inference_mpp", type=str, default="")
    p.add_argument("--skip_training", action="store_true")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--pretrained", type=str, default=None,
                   help="cpsam checkpoint (.pt or converted .npz)")
    p.add_argument("--save_path", type=str, default="models")
    p.add_argument("--precision", type=str, default="fp32")
    p.add_argument("--tiny_model", action="store_true",
                   help="tiny architecture (testing escape hatch)")
    args = p.parse_args()

    from classpose_tpu.train.dataset import ClassposeTrainingDataset
    from classpose_tpu.train.train import train_class_seg
    from classpose_tpu.train.train_utils import (
        get_class_weights,
        process_train_test,
    )

    train_data = np.load(args.train_data_path, allow_pickle=True)
    train_labels = np.load(args.train_labels_path, allow_pickle=True)
    test_data = np.load(args.test_data_path, allow_pickle=True)
    train_labels = [np.asarray(x).astype(int) for x in train_labels]
    # labels arrive as (H, W, 2) [instance, class]; class 0 = background,
    # classes already include the background channel (reference
    # run_cellpose_semantic.py:268-270)
    nclasses = int(max(x[..., 1].max() for x in train_labels)) + 1

    model_name = f"cellpose_{args.dataset_name}"
    model_path = os.path.join(args.save_path, model_name,
                              f"{model_name}.npz")

    if not args.skip_training:
        model = build_semantic_model(nclasses, args.pretrained,
                                     args.precision, tiny=args.tiny_model)
        labels_ic = [
            np.stack([x[..., 0], x[..., 1]]) for x in train_labels
        ]
        imgs = [
            np.transpose(np.asarray(x), (2, 0, 1)) for x in train_data
        ]
        tr_d, tr_l, tr_diam, *_ = process_train_test(
            imgs, labels_ic, min_train_masks=0
        )
        ds = ClassposeTrainingDataset(
            np.stack(tr_d), np.stack(tr_l),
            diameter_array=np.asarray(tr_diam),
            bsize=model.cfg.bsize,  # 256 (reference), 64 for --tiny_model
        )
        class_weights = get_class_weights(ds.class_counts)
        train_class_seg(
            model, ds,
            batch_size=4, n_epochs=args.epochs, learning_rate=5e-5,
            weight_decay=0.1, class_weights=class_weights,
            save_path=args.save_path, model_name=model_name,
        )

    from classpose_tpu.runner import ClassposeModel

    model = ClassposeModel(
        pretrained_model=model_path, precision=args.precision
    )  # .npz checkpoints are self-describing (config embedded)
    preds = []
    for x in test_data:
        xr = rescale_if_necessary(
            np.asarray(x), args.training_to_inference_mpp
        )
        masks, _flows, class_masks, _ = model.eval(
            xr.astype(np.float32), batch_size=64, augment=False,
            flow_threshold=0.4, cellprob_threshold=0.0,
        )
        out = np.stack([masks, class_masks], axis=-1)
        preds.append(
            rescale_label_if_necessary(out, np.asarray(x).shape[:2])
        )

    d = os.path.dirname(args.out_path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.save(args.out_path, np.array(preds, dtype="object"))


if __name__ == "__main__":
    main()
