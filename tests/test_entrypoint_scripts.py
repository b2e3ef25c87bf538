"""End-to-end tests for the dataset/eval entrypoints: dataset_to_hdf5 →
HDF5 training → run_inference evaluation."""

import numpy as np
import pytest


def _make_dataset(path, n=6, seed=0):
    rng = np.random.default_rng(seed)
    imgs, labs = [], []
    for i in range(n):
        inst = np.zeros((96, 96), np.float32)
        cls = np.zeros((96, 96), np.float32)
        yy, xx = np.mgrid[:96, :96]
        k = 0
        for _ in range(6):
            r = rng.integers(8, 12)
            cy, cx = rng.integers(r, 96 - r, 2)
            m = ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r) & (inst == 0)
            if m.sum() < 10:
                continue
            k += 1
            inst[m] = k
            cls[m] = rng.integers(1, 3)
        imgs.append(np.stack([200 - 60 * (inst > 0)] * 3).astype(np.float32))
        labs.append(np.stack([inst, cls]))
    np.save(path / "images.npy", np.stack(imgs))
    np.save(path / "labels.npy", np.stack(labs))


def test_dataset_to_hdf5_and_hdf5_training(tmp_path):
    import h5py

    from classpose_tpu.entrypoints.dataset_to_hdf5 import main_with_args
    from classpose_tpu.train.dataset import ClassposeHDF5Dataset

    _make_dataset(tmp_path)
    h5 = tmp_path / "data.h5"
    main_with_args(
        ["--data_path", str(tmp_path), "--output", str(h5),
         "--min_train_masks", "1"]
    )
    with h5py.File(h5) as f:
        assert f["labels"].shape[1] == 5
        assert "class_counts" in f and "instance_counts" in f

    ds = ClassposeHDF5Dataset(str(h5), bsize=64)
    assert len(ds) > 0
    img, lbl = ds[0]
    assert img.shape == (3, 64, 64) and lbl.shape == (4, 64, 64)
    # cached counts short-circuit recomputation
    assert ds._class_counts is not None
    sub = ds.subset([0, 1])
    assert len(sub) == 2
    with pytest.raises((IndexError, ValueError)):
        ds.subset([len(ds) + 5])


def test_run_inference_entrypoint(tmp_path, monkeypatch):
    import jax

    from classpose_tpu.entrypoints.run_inference import main_with_args
    from classpose_tpu.nn import ClassTransformer, ClassTransformerConfig
    from classpose_tpu.nn.convert import save_params

    _make_dataset(tmp_path, n=2)
    cfg = ClassTransformerConfig(
        n_cell_classes=3, embed_dim=32, depth=1, num_heads=2, neck_dim=16,
        bsize=64,
    )
    net = ClassTransformer(cfg)
    params = net.init(jax.random.PRNGKey(0),
                      np.zeros((1, 3, 64, 64), np.float32))
    ckpt = tmp_path / "m.npz"
    save_params(params, str(ckpt), cfg)
    main_with_args(
        [
            "--data_path", str(tmp_path), "--model_path", str(ckpt),
            "--output_dir", str(tmp_path / "out"), "--max_images", "2",
        ]
    )
    assert (tmp_path / "out" / "metrics.csv").exists()
    assert (tmp_path / "out" / "predictions.npy").exists()
    import pandas as pd

    df = pd.read_csv(tmp_path / "out" / "metrics.csv")
    assert "pq" in df.columns
