"""``classpose-evaluate`` CLI: batch inference + PQ evaluation on an
image/label dataset.

Functional equivalent of the reference paper_experiments/run_inference.py:
load npy images + (instance, class) labels, run ClassposeModel.eval over
every image, and compute the CoNIC multiclass PQ metrics against the
ground truth, saving prediction masks and CSV metrics.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from classpose_tpu.log import get_logger

logger = get_logger(__name__)


def main(args):
    from classpose_tpu.metrics.pq import compute_multiclass_pq_metrics
    from classpose_tpu.nn.convert import infer_structure
    from classpose_tpu.runner import ClassposeModel
    from classpose_tpu.train.train_utils import load_data_arrays

    images, labels = load_data_arrays(
        str(Path(args.data_path) / "images.npy"),
        str(Path(args.data_path) / "labels.npy"),
    )
    if args.max_images:
        images = images[: args.max_images]
        labels = labels[: args.max_images]

    structure, n_classes = infer_structure(args.model_path)
    model = ClassposeModel(
        pretrained_model=args.model_path,
        nclasses=n_classes,
        feature_transformation_structure=structure,
        precision=args.precision,
    )

    preds = []
    t0 = time.time()
    for i, img in enumerate(images):
        x = np.asarray(img, np.float32)
        if x.ndim == 3 and x.shape[0] in (1, 3):
            x = x.transpose(1, 2, 0)
        masks, flows, class_masks, _ = model.eval(
            x,
            batch_size=args.batch_size,
            flow_threshold=args.flow_threshold,
            cellprob_threshold=args.cellprob_threshold,
        )
        preds.append(np.stack([masks, class_masks], axis=-1))
        if (i + 1) % 10 == 0:
            logger.info("inference %d/%d (%.2f s/img)",
                        i + 1, len(images), (time.time() - t0) / (i + 1))

    gts = [
        np.stack(
            [np.asarray(lab[0]), np.asarray(lab[-1])], axis=-1
        ).astype(np.int32)
        for lab in labels
    ]

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "predictions.npy", np.stack(preds).astype(np.int32))

    global_df, per_image_df = compute_multiclass_pq_metrics(
        gts, preds, nr_classes=n_classes - 1 if args.background_class
        else n_classes,
        no_border_instances=args.no_border_instances,
    )
    global_df.to_csv(out / "metrics.csv", index=False)
    per_image_df.to_csv(out / "metrics_per_image.csv", index=False)
    print(global_df.to_string(index=False))
    return global_df


def main_with_args(argv=None):
    p = argparse.ArgumentParser(
        description="Batch inference + multiclass PQ evaluation."
    )
    p.add_argument("--data_path", required=True,
                   help="Directory with images.npy and labels.npy")
    p.add_argument("--model_path", required=True)
    p.add_argument("--output_dir", default="inference_out")
    p.add_argument("--precision", default="fp32",
                   choices=["fp32", "fp16", "bf16"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--flow_threshold", type=float, default=0.4)
    p.add_argument("--cellprob_threshold", type=float, default=0.0)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--no_border_instances", action="store_true",
                   default=False)
    p.add_argument("--background_class", action="store_true", default=False,
                   help="model's class 0 is background (exclude from PQ)")
    main(p.parse_args(argv))


if __name__ == "__main__":
    main_with_args()
