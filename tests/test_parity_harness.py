"""Real-weight parity harness tests on synthetic checkpoints (VERDICT r1
item 4): the one-command gate must pass end-to-end on a torch checkpoint
with random weights, reporting per-layer diffs within fp32 tolerance and
perfect self-F1, so it is ready to fire on the published cpsam/classpose
weights the moment egress exists."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    from classpose_tpu.nn.torch_replica import RefClassTransformer

    torch.manual_seed(0)
    replica = RefClassTransformer(
        ps=8, bsize=64, n_cell_classes=4, embed_dim=64, depth=2,
        num_heads=2, neck_dim=32,
    )
    path = tmp_path_factory.mktemp("ckpt") / "tiny_classpose.pt"
    torch.save(replica.state_dict(), path)
    return str(path)


def test_parity_harness_end_to_end(tiny_checkpoint, tmp_path):
    from classpose_tpu.entrypoints.parity_check import (
        main_with_args,
        synthetic_tiles,
    )

    out = tmp_path / "report.json"
    report = main_with_args([
        "--checkpoint", tiny_checkpoint,
        "--n_tiles", "2", "--tile_size", "64",
        "--niter", "20",
        "--output", str(out),
    ])
    saved = json.loads(out.read_text())
    assert saved["checkpoint"] == tiny_checkpoint

    pl = report["per_layer"]
    assert pl["missing_keys"] == []
    assert pl["unexpected_keys"] == []
    # every mapped layer compared, all within fp32 tolerance
    assert set(pl["layers"]) >= {"patch_embed", "block_0", "block_1",
                                 "encoder", "out", "out_class"}
    for name, diff in pl["layers"].items():
        assert diff <= 2e-4, (name, diff)
    assert report["logit_parity_pass"] is True
    assert report["config"]["n_cell_classes"] == 4

    tiles = synthetic_tiles(2, 64)
    assert tiles.shape == (2, 64, 64, 3)
    # deterministic across calls (fixed tile set contract)
    np.testing.assert_array_equal(tiles, synthetic_tiles(2, 64))


def test_parity_harness_reference_mask_metrics(tiny_checkpoint,
                                               monkeypatch):
    """The reference-mask comparison path: identical masks → F1 = 1 and
    perfect class agreement; a dropped instance lowers recall."""
    from classpose_tpu.entrypoints.parity_check import (
        run_parity,
        synthetic_tiles,
    )
    from classpose_tpu.runner import ClassposeModel

    masks = np.zeros((64, 64), np.int32)
    masks[5:20, 5:20] = 1
    masks[30:45, 30:45] = 2
    masks[50:60, 5:15] = 3
    cms = np.where(masks > 0, (masks % 3) + 1, 0).astype(np.int32)

    monkeypatch.setattr(
        ClassposeModel, "eval",
        lambda self, x, **kw: (masks, None, cms, None),
    )
    tiles = synthetic_tiles(1, 64)
    report = run_parity(
        tiny_checkpoint, tiles,
        reference_masks=np.asarray([masks]),
        reference_class_masks=np.asarray([cms]),
        niter=20,
    )
    assert report["detection"]["f1"] == 1.0
    assert report["detection"]["pq"] == pytest.approx(1.0, abs=1e-5)
    assert report["classification_pixel_agreement"] == 1.0
    assert report["n_cells_per_tile"] == [3]

    ref2 = masks.copy()
    ref2[50:60, 5:15] = 0  # reference lacks instance 3 → our extra = FP
    report2 = run_parity(
        tiny_checkpoint, tiles, reference_masks=np.asarray([ref2]),
        niter=20,
    )
    assert report2["detection"]["f1"] == pytest.approx(0.8)  # 2TP 1FP 0FN


def test_parity_harness_directory_mode(tiny_checkpoint, tmp_path):
    """A directory of checkpoints is validated in one run with a
    consolidated report (VERDICT r2 item 10)."""
    import shutil

    from classpose_tpu.entrypoints.parity_check import main_with_args

    d = tmp_path / "ckpts"
    d.mkdir()
    shutil.copy(tiny_checkpoint, d / "model_a.pt")
    shutil.copy(tiny_checkpoint, d / "model_b.pt")
    (d / "broken.pt").write_bytes(b"not a checkpoint")

    out = tmp_path / "consolidated.json"
    report = main_with_args([
        "--checkpoint", str(d),
        "--n_tiles", "1", "--tile_size", "64",
        "--niter", "10",
        "--output", str(out),
    ])
    saved = json.loads(out.read_text())
    assert set(saved["checkpoints"]) == {"model_a.pt", "model_b.pt",
                                         "broken.pt"}
    for name in ("model_a.pt", "model_b.pt"):
        assert saved["checkpoints"][name]["logit_parity_pass"] is True
        assert saved["summary"][name]["logit_parity_pass"] is True
    # a corrupt file is reported, not fatal
    assert "error" in saved["summary"]["broken.pt"]
    assert report["summary"].keys() == saved["summary"].keys()
