"""Multi-device tile-parallel pipeline test on the virtual 8-device CPU
mesh: --device cpu fans tiles out over all devices; results must match the
single-device run."""

import numpy as np
import pytest

from classpose_tpu.io.array_reader import synthetic_wsi
from classpose_tpu.pipeline.predict_wsi import main
from classpose_tpu.utils import get_device


@pytest.fixture(autouse=True)
def _array_reader(monkeypatch):
    monkeypatch.setenv("WSI_READER", "array")
    from classpose_tpu import model_configs

    monkeypatch.setattr(
        model_configs.ModelConfig, "download_if_necessary", lambda self: None
    )


def test_get_device_parsing():
    import jax

    assert len(get_device(None)) == 1
    assert len(get_device("cpu")) == len(jax.devices("cpu"))
    assert len(get_device("cpu:0,2")) == 2
    # reference syntax maps onto local accelerators (CPU-only host degrades)
    assert len(get_device("cuda:0,1")) == 2


def test_pipeline_multidevice_matches_single(tmp_path):
    import jax
    import yaml

    from classpose_tpu.nn import ClassTransformer, ClassTransformerConfig
    from classpose_tpu.nn.convert import save_params

    slide, gt = synthetic_wsi(width=2048, height=1024, n_cells=60, seed=11,
                              mpp=0.5)
    sp = tmp_path / "s.npy"
    np.save(sp, slide._level0)

    cfg = ClassTransformerConfig(
        n_cell_classes=4, embed_dim=32, depth=1, num_heads=2, neck_dim=16,
        bsize=64,
    )
    net = ClassTransformer(cfg)
    params = net.init(jax.random.PRNGKey(0),
                      np.zeros((1, 3, 64, 64), np.float32))
    ckpt = tmp_path / "tiny.npz"
    save_params(params, str(ckpt), cfg)
    cfg_yaml = tmp_path / "config.yaml"
    cfg_yaml.write_text(
        yaml.safe_dump(
            {"path": str(ckpt), "mpp": 0.5,
             "cell_types": ["A", "B", "C", "D"]}
        )
    )

    def _args(out, device):
        return type("Args", (), dict(
            model_config=str(cfg_yaml), slide_path=str(sp),
            output_folder=str(out), tile_size=512, overlap=64,
            batch_size=4, precision="fp32", tta=False, roi_geojson=None,
            output_type=None, tissue_detection_model_path=None,
            artefact_detection_model_path=None, filter_artefacts=False,
            roi_class_priority=None, min_area=0, mpp=0.5, device=device,
            inference_threads=2,
        ))()

    single = main(_args(tmp_path / "single", None))
    multi = main(_args(tmp_path / "multi", "cpu"))
    assert multi["n_tiles"] == single["n_tiles"]
    assert multi["n_cells"] == single["n_cells"]

    # the mesh-sharded program partitions independent per-tile work, so
    # the cells must be IDENTICAL, not merely equinumerous
    import json

    def _cells(out):
        with open(out / "s_cell_contours.geojson") as f:
            feats = json.load(f)["features"]
        return sorted(
            json.dumps(
                (f["geometry"]["coordinates"],
                 f["properties"].get("classification")),
                sort_keys=True,
            )
            for f in feats
        )

    assert _cells(tmp_path / "multi") == _cells(tmp_path / "single")


def test_pipeline_multidevice_uses_sharded_path(tmp_path):
    """--device cpu (8 virtual devices) must arm the mesh-sharded
    eval_batch path, not per-device replicas (VERDICT r1 item 2)."""
    import jax

    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.pipeline.predict_wsi import DeviceWorker
    from classpose_tpu.runner import ClassposeModel

    cfg = ClassTransformerConfig(
        n_cell_classes=3, embed_dim=32, depth=1, num_heads=2, neck_dim=16,
        bsize=64,
    )
    model = ClassposeModel(cfg=cfg, precision="fp32")
    worker = DeviceWorker(
        model, labels=["a", "b"], prediction_to_slide_scale=1.0,
        devices=list(jax.devices()), tile_buckets=(64,), niter=8,
    )
    assert worker.sharded
    assert worker.tile_batch == 16  # max(8, 2·n_devices), r5 depth knobs
    assert int(model._mesh.devices.size) == 8
    # params replicated once over the mesh
    leaf = jax.tree_util.tree_leaves(model.params)[0]
    assert len(leaf.devices()) == 8
