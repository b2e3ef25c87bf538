"""Dataset bookkeeping tools shared by the paper-experiment scripts.

Functional equivalents of the reference's one-off analysis utilities
(/root/reference/paper_experiments/scripts/count_cell_types.py,
iou_between_gt_and_squares.py, organise-datasets.py) with the per-image
Python loops replaced by vectorized numpy (bincount / extrema-at) — the
same results, usable on CoNIC-scale datasets without a process pool.

Everything here is host-side numpy; no JAX involved.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

# Published class vocabularies of the six benchmark datasets (the same
# tables as reference scripts/count_cell_types.py:6-66 — dataset facts,
# mirrored by classpose_tpu.model_configs cell_types).
DATASET_LABELS: dict[str, dict[int, str]] = {
    "conic": {
        1: "Neutrophil", 2: "Epithelial", 3: "Lymphocyte",
        4: "Plasma", 5: "Eosinophil", 6: "Connective",
    },
    "consep": {
        1: "Other", 2: "Inflammatory", 3: "Healthy epithelial",
        4: "Malignant epithelial", 5: "Stroma", 6: "Muscle",
    },
    "nucls": {
        1: "Tumor", 2: "Stroma", 3: "Lymphocyte",
        4: "Plasma cell", 5: "Macrophage", 6: "Other",
    },
    "monusac": {
        1: "Epithelial", 2: "Lymphocyte", 3: "Macrophage", 4: "Neutrophil",
    },
    "glysac": {
        1: "Other", 2: "Lymphocyte", 3: "Epithelial", 4: "Ambiguous",
    },
    "puma": {
        1: "Apoptosis", 2: "Tumor", 3: "Endothelial", 4: "Stroma",
        5: "Lymphocyte", 6: "Histocyte", 7: "Epithelial",
        8: "Melanophage", 9: "Other",
    },
}

# Original-label → classpose-label remaps used when organising the raw
# downloads (reference organise-datasets.py:40-112; published recipes).
DATASET_CONVERSIONS: dict[str, dict[int, int]] = {
    "conic": {i: i for i in range(7)},
    "consep": {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 5},
    "nucls": {
        0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 1, 7: 2, 8: 6, 9: 6,
        10: 6, 11: 6, 12: 6, 99: 0, 253: 0,
    },
    "monusac": {0: 0, 1: 1, 2: 2, 3: 3, 4: 4},
    "glysac": {
        0: 0, 1: 1, 2: 1, 3: 3, 4: 2, 5: 2, 6: 2, 7: 2, 8: 3, 9: 1, 10: 1,
    },
}

UNLABELED_CLASS = 99  # sentinel row for instances with no class annotation


def count_annotation(annotation: np.ndarray) -> dict[int, int]:
    """Count distinct instance ids per class in one (H, W, 2) annotation
    (instance channel 0, class channel 1).

    Matches reference count_cell_types.py:92-107 exactly — including its
    edge case that instance id 0 under a class-labelled pixel contributes
    one count to that class — via a single unique() over (class, id)
    pairs instead of a per-class loop.
    """
    inst = annotation[..., 0].astype(np.int64).ravel()
    cls = annotation[..., 1].astype(np.int64).ravel()
    n_ids = int(inst.max()) + 1 if inst.size else 1
    labelled = cls > 0
    pairs = np.unique(cls[labelled] * n_ids + inst[labelled])
    counts: dict[int, int] = {}
    for c, n in zip(*np.unique(pairs // n_ids, return_counts=True)):
        counts[int(c)] = int(n)
    # instances (>0) that appear under no class label at all
    ids = np.unique(inst[inst > 0])
    labelled_ids = np.unique(pairs % n_ids)
    n_unlabeled = int(np.sum(~np.isin(ids, labelled_ids)))
    if n_unlabeled:
        counts[UNLABELED_CLASS] = counts.get(UNLABELED_CLASS, 0) + n_unlabeled
    return counts


def count_cell_types(annotations) -> dict[int, int]:
    """Aggregate :func:`count_annotation` over an iterable of (H, W, 2)
    annotations (reference count_cell_types.py:88-112)."""
    total: dict[int, int] = {}
    for ann in annotations:
        for k, v in count_annotation(np.asarray(ann)).items():
            total[k] = total.get(k, 0) + v
    return total


def instance_bbox_ious(instances: np.ndarray) -> np.ndarray:
    """Per-instance IoU between each instance and its own bounding box,
    in ascending-id order (reference iou_between_gt_and_squares.py:7-20).

    Vectorized: per-id pixel counts via bincount and per-id bbox extrema
    via ``np.minimum.at``/``maximum.at`` — one pass instead of one
    boolean scan per instance.
    """
    inst = np.asarray(instances).astype(np.int64)
    H, W = inst.shape[-2], inst.shape[-1]
    flat = inst.reshape(-1, H, W) if inst.ndim == 3 else inst[None]
    out = []
    for m in flat:
        ids = m.ravel()
        n = int(ids.max()) + 1 if ids.size else 1
        areas = np.bincount(ids, minlength=n)
        ys, xs = np.nonzero(m)
        vid = m[ys, xs]
        y0 = np.full(n, H, np.int64)
        x0 = np.full(n, W, np.int64)
        y1 = np.full(n, -1, np.int64)
        x1 = np.full(n, -1, np.int64)
        np.minimum.at(y0, vid, ys)
        np.minimum.at(x0, vid, xs)
        np.maximum.at(y1, vid, ys)
        np.maximum.at(x1, vid, xs)
        present = np.nonzero(areas[1:] > 0)[0] + 1
        bbox = (y1[present] - y0[present] + 1) * (x1[present] - x0[present] + 1)
        out.append(areas[present] / bbox)
    return np.concatenate(out) if out else np.empty(0)


def split_dataset(
    counts: np.ndarray,
    keys: list,
    n_classes: int,
    n_small_classes: int = 1,
    n_attempts: int = 250,
    test_fraction: float = 0.1,
    seed: int = 42,
) -> tuple[list, list]:
    """Greedy stratified train/test split over per-slide class-count rows
    (reference organise-datasets.py:115-182 semantics, same seed/greedy
    rule so splits reproduce).

    ``counts`` is (n_slides, n_classes); ``keys`` the slide identifiers.
    Each shuffle pass walks the slides, sending a slide to test while
    more than ``n_small_classes`` classes sit below ``test_fraction`` of
    their train mass, and keeps the pass whose final test proportions
    have the lowest mean squared error to ``test_fraction``.
    """
    counts = np.asarray(counts, np.float64)
    order = list(range(len(keys)))
    rng = np.random.RandomState(seed)
    best = (np.inf, None, None)
    for _ in range(n_attempts):
        rng.shuffle(order)
        acc_tr = np.zeros(n_classes)
        acc_te = np.zeros(n_classes)
        tr, te = [], []
        for i in order:
            prop = np.where(acc_tr > 0, acc_te / np.maximum(acc_tr, 1e-30), 1.0)
            if np.sum(prop < test_fraction) > n_small_classes:
                te.append(i)
                acc_te += counts[i]
            else:
                tr.append(i)
                acc_tr += counts[i]
        mse = float(np.mean(
            np.square(acc_te / np.maximum(acc_tr + acc_te, 1e-30)
                      - test_fraction)
        ))
        if mse < best[0]:
            best = (mse, list(tr), list(te))
    return [keys[i] for i in best[1]], [keys[i] for i in best[2]]


def pad_to_multiple(image: np.ndarray, tile_size: int) -> np.ndarray:
    """Zero-pad trailing edges so both spatial dims are multiples of
    ``tile_size`` (reference organise-datasets.py:210-224)."""
    M, N = image.shape[:2]
    pads = [((tile_size - M) % tile_size, (tile_size - N) % tile_size)]
    pad = ((0, pads[0][0]), (0, pads[0][1])) + ((0, 0),) * (image.ndim - 2)
    return np.pad(image, pad)


def tile_image(image: np.ndarray, tile_size: int) -> list[np.ndarray]:
    """Grid-tile an image with edge tiles re-anchored inside the bounds
    (reference organise-datasets.py:184-207 semantics: stride =
    tile_size, last row/col shifted to end exactly at the image edge)."""
    M, N = image.shape[:2]
    tiles = []
    for i in range(0, M + 1, tile_size):
        for j in range(0, N + 1, tile_size):
            a = min(i, M - tile_size)
            c = min(j, N - tile_size)
            tiles.append(image[a : a + tile_size, c : c + tile_size])
    return tiles


def remap_classes(class_mask: np.ndarray, conversion: dict[int, int]):
    """Apply an original→classpose label conversion via a lookup table."""
    lut = np.zeros(max(conversion) + 1, dtype=np.int64)
    for k, v in conversion.items():
        lut[k] = v
    return lut[np.asarray(class_mask).astype(np.int64)]


def save_arrays(images, labels, out_dir: Path, is_object: bool = False):
    """Write images.npy / labels.npy in the layout the training stack's
    ``load_data_arrays`` expects (object dtype for ragged sizes)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if is_object:
        images = np.array(list(images), dtype=np.object_)
        labels = np.array(list(labels), dtype=np.object_)
    else:
        images = np.asarray(images)
        labels = np.asarray(labels)
    np.save(out_dir / "images.npy", images)
    np.save(out_dir / "labels.npy", labels)
