"""Organise raw benchmark downloads into classpose training arrays.

Equivalent of /root/reference/paper_experiments/scripts/organise-datasets.py
with the per-dataset copy-paste branches factored into two generic loaders
plus the shared split/tile/remap core in :mod:`dataset_tools`:

- ``npy`` layout (CoNIC): ``images.npy`` + ``labels.npy`` (N, H, W, 2) +
  ``patch_info.csv`` mapping patches to source slides. Slides are
  stratified-split so no slide leaks across train/test, then patches are
  routed by their slide.
- ``dirs`` layout (CoNSeP / GLySAC / NuCLS style): ``Images/*.png`` +
  ``Labels/*.mat`` (keys ``inst_map``/``type_map``) or ``labels/*.png``
  class maps. Each image is padded + grid-tiled to ``--tile_size`` and
  each source image is one stratification unit.

Class remapping uses the published conversion tables
(``dataset_tools.DATASET_CONVERSIONS``). MIDOG / MoNuSAC / PUMA need
their bespoke raw formats (paired tiffs, per-slide masks, geojson) —
convert those to either layout above with the in-repo
``classpose_tpu.io.tiff_reader`` and geojson utilities, then run this.

Example:
  python paper_experiments/organise_datasets.py --dataset conic \
      --layout npy --input data/original/conic --output data/processed/conic
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from dataset_tools import (
    DATASET_CONVERSIONS,
    pad_to_multiple,
    remap_classes,
    save_arrays,
    split_dataset,
    tile_image,
)


def _counts_per_unit(labels, n_classes: int) -> np.ndarray:
    """(n_units, n_classes) distinct-instance counts per class."""
    rows = []
    for lab in labels:
        lab = np.asarray(lab)
        row = [
            len(np.unique(lab[..., 0][lab[..., 1] == c]))
            for c in range(1, n_classes + 1)
        ]
        rows.append(row)
    return np.asarray(rows, np.float64)


def organise_npy(
    input_dir: Path, output_dir: Path, conversion: dict[int, int],
    test_fraction: float,
) -> dict[str, int]:
    """CoNIC-style: patches grouped by source slide via patch_info.csv
    (reference organise-datasets.py:268-310)."""
    import pandas as pd

    images = np.load(input_dir / "images.npy")
    labels = np.load(input_dir / "labels.npy")
    info = pd.read_csv(input_dir / "patch_info.csv")
    slide_ids = info[info.columns[0]].str.replace(
        "-[0-9]+$", "", regex=True
    )
    n_classes = max(conversion.values())

    # per-slide class counts, then a leakage-free stratified split
    slides = sorted(slide_ids.unique())
    by_slide = {s: np.zeros(n_classes) for s in slides}
    for i, lab in enumerate(labels):
        lab = np.asarray(lab)
        for c in range(1, n_classes + 1):
            by_slide[slide_ids.iloc[i]][c - 1] += len(
                np.unique(lab[..., 0][lab[..., 1] == c])
            )
    counts = np.stack([by_slide[s] for s in slides])
    train_slides, test_slides = split_dataset(
        counts, slides, n_classes, test_fraction=test_fraction
    )
    train_set = set(train_slides)
    sizes = {}
    for name, keep in (("train", True), ("test", False)):
        idx = np.asarray([
            (slide_ids.iloc[i] in train_set) == keep
            for i in range(len(labels))
        ])
        labs = labels[idx].copy()
        labs[..., 1] = remap_classes(labs[..., 1], conversion)
        save_arrays(images[idx], labs, output_dir / name)
        sizes[name] = int(idx.sum())
    return sizes


def _load_dir_pairs(input_dir: Path):
    """Yield (key, image, (H, W, 2) label) from an Images/Labels tree."""
    from PIL import Image

    img_dir = next(
        d for d in (input_dir / "Images", input_dir / "images")
        if d.is_dir()
    )
    lab_dir = next(
        d for d in (input_dir / "Labels", input_dir / "labels")
        if d.is_dir()
    )
    for img_path in sorted(img_dir.glob("*.png")):
        key = img_path.stem
        image = np.asarray(Image.open(img_path))[..., :3]
        mat = lab_dir / f"{key}.mat"
        png = lab_dir / f"{key}.png"
        if mat.exists():
            import scipy.io

            d = scipy.io.loadmat(mat)
            label = np.stack(
                [d["inst_map"], d["type_map"]], axis=-1
            ).astype(np.int64)
        elif png.exists():
            # class-map-only labels (NuCLS): instances via connected
            # components of the class map
            import cv2

            cls = np.asarray(Image.open(png)).astype(np.int64)
            if cls.ndim == 3:
                cls = cls[..., 0]
            _, inst = cv2.connectedComponents(
                (cls > 0).astype(np.uint8), connectivity=4
            )
            label = np.stack([inst.astype(np.int64), cls], axis=-1)
        else:
            print(f"Missing label for {key}")
            continue
        yield key, image, label


def organise_dirs(
    input_dir: Path, output_dir: Path, conversion: dict[int, int],
    test_fraction: float, tile_size: int,
) -> dict[str, int]:
    """CoNSeP/GLySAC-style directory trees. If the download already has
    Train/Test splits, they are preserved; otherwise one stratified
    split is computed over source images."""
    n_classes = max(conversion.values())
    presplit = (input_dir / "Train").is_dir() and (input_dir / "Test").is_dir()
    units: dict[str, list] = {"train": [], "test": []}
    if presplit:
        for sub, name in (("Train", "train"), ("Test", "test")):
            units[name] = list(_load_dir_pairs(input_dir / sub))
    else:
        pairs = list(_load_dir_pairs(input_dir))
        counts = _counts_per_unit([p[2] for p in pairs], n_classes)
        train_keys, _ = split_dataset(
            counts, [p[0] for p in pairs], n_classes,
            test_fraction=test_fraction,
        )
        train_keys = set(train_keys)
        for p in pairs:
            units["train" if p[0] in train_keys else "test"].append(p)

    sizes = {}
    for name, pairs in units.items():
        images, labels = [], []
        for _, image, label in pairs:
            label = label.copy()
            label[..., 1] = remap_classes(label[..., 1], conversion)
            images.extend(tile_image(pad_to_multiple(image, tile_size),
                                     tile_size))
            labels.extend(tile_image(pad_to_multiple(label, tile_size),
                                     tile_size))
        save_arrays(images, labels, output_dir / name)
        sizes[name] = len(images)
    return sizes


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--dataset", required=True,
                        choices=sorted(DATASET_CONVERSIONS))
    parser.add_argument("--layout", choices=("npy", "dirs"), required=True)
    parser.add_argument("--input", required=True, type=Path)
    parser.add_argument("--output", required=True, type=Path)
    parser.add_argument("--test_fraction", type=float, default=0.1)
    parser.add_argument("--tile_size", type=int, default=256)
    args = parser.parse_args(argv)

    conversion = DATASET_CONVERSIONS[args.dataset]
    if args.layout == "npy":
        sizes = organise_npy(
            args.input, args.output, conversion, args.test_fraction
        )
    else:
        sizes = organise_dirs(
            args.input, args.output, conversion, args.test_fraction,
            args.tile_size,
        )
    print({k: v for k, v in sorted(sizes.items())})
    return sizes


if __name__ == "__main__":
    main()
