"""Paper-experiment dataset tools vs naive per-instance oracles.

The vectorized counting / bbox-IoU / split / tiling utilities in
paper_experiments/dataset_tools.py must reproduce the reference scripts'
per-instance-loop semantics (scripts/count_cell_types.py:92-112,
iou_between_gt_and_squares.py:7-20, organise-datasets.py:115-224).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                       / "paper_experiments"))

from dataset_tools import (  # noqa: E402
    count_annotation,
    instance_bbox_ious,
    pad_to_multiple,
    split_dataset,
    tile_image,
)


def _synthetic_annotation(rng, H=96, W=96, n=12, n_classes=4):
    inst = np.zeros((H, W), np.int64)
    cls = np.zeros((H, W), np.int64)
    for i in range(1, n + 1):
        cy, cx = rng.integers(8, H - 8), rng.integers(8, W - 8)
        r = rng.integers(2, 6)
        yy, xx = np.mgrid[:H, :W]
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        inst[m] = i
        # some instances left unlabelled (class 0)
        if i % 5 != 0:
            cls[m] = rng.integers(1, n_classes + 1)
    return np.stack([inst, cls], axis=-1)


def _count_oracle(annotation):
    """Reference loop (count_cell_types.py:92-112), verbatim semantics."""
    instances = annotation[:, :, 0]
    classifications = annotation[:, :, 1]
    ui = np.unique(instances)
    ui = ui[ui > 0]
    label_count = {}
    all_instances = []
    for i in range(1, int(classifications.max()) + 1):
        u = np.unique(instances[classifications == i])
        all_instances.extend(u)
        if len(u):
            label_count[i] = label_count.get(i, 0) + len(u)
    no_annotations = ui[~np.isin(ui, np.unique(all_instances))]
    if len(no_annotations) > 0:
        label_count[99] = label_count.get(99, 0) + len(no_annotations)
    return label_count


def test_count_annotation_matches_reference_loop():
    rng = np.random.default_rng(0)
    for _ in range(5):
        ann = _synthetic_annotation(rng)
        got = count_annotation(ann)
        want = {k: v for k, v in _count_oracle(ann).items() if v > 0}
        assert got == want


def test_count_annotation_id0_under_class_edge_case():
    # reference counts instance id 0 when a class pixel sits on background
    ann = np.zeros((8, 8, 2), np.int64)
    ann[2:4, 2:4, 1] = 1  # class 1 on background only
    ann[5:7, 5:7, 0] = 3  # unlabelled instance
    got = count_annotation(ann)
    assert got == _count_oracle(ann) == {1: 1, 99: 1}


def test_instance_bbox_ious_matches_loop():
    rng = np.random.default_rng(1)
    ann = _synthetic_annotation(rng)[..., 0]
    got = instance_bbox_ious(ann)
    # naive loop (reference get_ious)
    want = []
    for i in np.unique(ann):
        if i == 0:
            continue
        m = ann == i
        ys, xs = np.where(m)
        bbox = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
        want.append(m.sum() / bbox)
    np.testing.assert_allclose(got, want)
    # circles are not squares
    assert np.all(got <= 1.0) and np.any(got < 0.95)


def test_split_dataset_stratified_and_deterministic():
    rng = np.random.default_rng(2)
    n_slides, n_classes = 40, 5
    counts = rng.integers(0, 50, size=(n_slides, n_classes)).astype(float)
    keys = [f"s{i}" for i in range(n_slides)]
    tr1, te1 = split_dataset(counts, keys, n_classes, test_fraction=0.1)
    tr2, te2 = split_dataset(counts, keys, n_classes, test_fraction=0.1)
    assert tr1 == tr2 and te1 == te2  # seeded → reproducible
    assert sorted(tr1 + te1) == sorted(keys)  # partition
    idx = {k: i for i, k in enumerate(keys)}
    te_mass = counts[[idx[k] for k in te1]].sum(0)
    frac = te_mass / counts.sum(0)
    # every class lands near the 10% target
    assert np.all(frac > 0.02) and np.all(frac < 0.35), frac


def test_tile_image_covers_and_reanchors():
    img = np.arange(70 * 50).reshape(70, 50)
    tiles = tile_image(pad_to_multiple(img[..., None], 32)[..., 0], 32)
    assert all(t.shape == (32, 32) for t in tiles)
    # every source pixel appears in at least one tile
    seen = set()
    for t in tiles:
        seen.update(t.ravel().tolist())
    assert set(img.ravel().tolist()) <= seen


def test_count_cell_types_cli(tmp_path, monkeypatch):
    import count_cell_types as cct

    rng = np.random.default_rng(3)
    anns = np.stack([_synthetic_annotation(rng) for _ in range(3)])
    d = tmp_path / "conic" / "processed" / "train"
    d.mkdir(parents=True)
    np.save(d / "labels.npy", anns)
    monkeypatch.chdir(tmp_path)
    df = cct.main(["--annotations", str(d / "labels.npy"),
                   "--output_dir", str(tmp_path / "out")])
    assert (tmp_path / "out" / "counts.csv").exists()
    assert df["train"].sum() > 0
    assert set(df["class_name"]) <= {
        "Neutrophil", "Epithelial", "Lymphocyte", "Plasma", "Eosinophil",
        "Connective", "Unlabeled",
    }


def test_organise_dirs_roundtrip(tmp_path):
    pytest.importorskip("scipy.io")
    import scipy.io

    from organise_datasets import main as organise_main

    rng = np.random.default_rng(4)
    for sub, n in (("Train", 3), ("Test", 2)):
        (tmp_path / "raw" / sub / "Images").mkdir(parents=True)
        (tmp_path / "raw" / sub / "Labels").mkdir(parents=True)
        from PIL import Image

        for i in range(n):
            ann = _synthetic_annotation(rng, H=80, W=80, n_classes=7)
            img = rng.integers(0, 255, (80, 80, 3)).astype(np.uint8)
            Image.fromarray(img).save(
                tmp_path / "raw" / sub / "Images" / f"im{i}.png"
            )
            scipy.io.savemat(
                tmp_path / "raw" / sub / "Labels" / f"im{i}.mat",
                {"inst_map": ann[..., 0], "type_map": ann[..., 1]},
            )
    sizes = organise_main([
        "--dataset", "consep", "--layout", "dirs",
        "--input", str(tmp_path / "raw"),
        "--output", str(tmp_path / "proc"),
        "--tile_size", "64",
    ])
    assert sizes["train"] > 0 and sizes["test"] > 0
    for name in ("train", "test"):
        images = np.load(tmp_path / "proc" / name / "images.npy")
        labels = np.load(tmp_path / "proc" / name / "labels.npy")
        assert images.shape[1:] == (64, 64, 3)
        assert labels.shape[1:] == (64, 64, 2)
        # consep conversion folds original class 7 → 5
        assert labels[..., 1].max() <= 6
