"""Batched eval equivalence: eval_batch must produce the same instances as
per-tile eval, and the pipeline's tile_batch path the same cells."""

import numpy as np
import jax
import pytest

from classpose_tpu.io.array_reader import synthetic_wsi
from classpose_tpu.pipeline.predict_wsi import main


def test_eval_batch_matches_per_tile_onehot_qc(monkeypatch):
    """The TPU production QC path (one-hot segment reductions + dense
    int16 device labels), forced onto the CPU backend, must produce the
    same instances as per-tile eval."""
    monkeypatch.setenv("CLASSPOSE_QC_ONEHOT", "1")

    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.runner import ClassposeModel

    cfg = ClassTransformerConfig(
        n_cell_classes=3, embed_dim=32, depth=1, num_heads=2, neck_dim=16,
        bsize=64,
    )
    model = ClassposeModel(cfg=cfg, precision="fp32")
    rng = np.random.default_rng(1)
    tiles = rng.uniform(0, 255, (2, 128, 128, 3)).astype(np.float32)
    batched = model.eval_batch(tiles, batch_size=4, niter=40, min_size=1)
    for i in range(2):
        masks_i, _, cm_i, _ = model.eval(
            tiles[i], batch_size=4, niter=40, min_size=1
        )
        np.testing.assert_array_equal(batched[i][0], masks_i)
        np.testing.assert_array_equal(batched[i][1], cm_i)


def test_eval_batch_matches_per_tile():
    import jax

    from classpose_tpu.dynamics import labels_to_flows
    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.runner import ClassposeModel

    cfg = ClassTransformerConfig(
        n_cell_classes=3, embed_dim=32, depth=1, num_heads=2, neck_dim=16,
        bsize=64,
    )
    model = ClassposeModel(cfg=cfg, precision="fp32")
    rng = np.random.default_rng(0)
    tiles = rng.uniform(0, 255, (3, 128, 128, 3)).astype(np.float32)
    batched = model.eval_batch(tiles, batch_size=4, niter=40, min_size=1)
    for i in range(3):
        masks_i, flows_i, cm_i, _ = model.eval(
            tiles[i], batch_size=4, niter=40, min_size=1
        )
        np.testing.assert_array_equal(batched[i][0], masks_i)
        np.testing.assert_array_equal(batched[i][1], cm_i)


@pytest.fixture
def _array_reader(monkeypatch):
    monkeypatch.setenv("WSI_READER", "array")
    from classpose_tpu import model_configs

    monkeypatch.setattr(
        model_configs.ModelConfig, "download_if_necessary", lambda self: None
    )


def test_pipeline_tile_batch_matches(_array_reader, tmp_path):
    import jax
    import yaml

    from classpose_tpu.nn import ClassTransformer, ClassTransformerConfig
    from classpose_tpu.nn.convert import save_params

    slide, gt = synthetic_wsi(width=1536, height=1024, n_cells=40, seed=3,
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
    ckpt = tmp_path / "t.npz"
    save_params(params, str(ckpt), cfg)
    cfg_yaml = tmp_path / "c.yaml"
    cfg_yaml.write_text(yaml.safe_dump(
        {"path": str(ckpt), "mpp": 0.5, "cell_types": list("ABCD")}
    ))

    def _args(out, tile_batch):
        return type("Args", (), dict(
            model_config=str(cfg_yaml), slide_path=str(sp),
            output_folder=str(out), tile_size=512, overlap=64,
            batch_size=4, precision="fp32", tta=False, roi_geojson=None,
            output_type=None, tissue_detection_model_path=None,
            artefact_detection_model_path=None, filter_artefacts=False,
            roi_class_priority=None, min_area=0, mpp=0.5, device=None,
            inference_threads=2, tile_batch=tile_batch,
        ))()

    r1 = main(_args(tmp_path / "o1", 1))
    r2 = main(_args(tmp_path / "o2", 3))  # 6 tiles → 2 full batches
    assert r2["n_tiles"] == r1["n_tiles"]
    assert r2["n_cells"] == r1["n_cells"]


def test_eval_batch_pallas_eligible_geometry(monkeypatch):
    """Trace the FULL fused program at a geometry where the get_masks
    Pallas kernels are eligible (256², D=64 halo fits) with the
    interpret-mode kernels — the other runner tests use sizes where the
    pallas path is statically disabled, so without this the production
    cond+kernel graph would never be traced in CI."""
    from classpose_tpu.ops.sample_pallas import sampler_supported

    assert sampler_supported(256, 256, 64, 3)
    assert sampler_supported(256, 256, 64, 1)

    monkeypatch.setenv("CLASSPOSE_PALLAS_SAMPLER", "interpret")
    monkeypatch.setenv("CLASSPOSE_QC_ONEHOT", "1")
    jax.clear_caches()
    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.runner import ClassposeModel

    cfg = ClassTransformerConfig(
        embed_dim=64, depth=2, num_heads=2, neck_dim=32,
        n_cell_classes=4, dtype="float32",
    )
    model = ClassposeModel(cfg=cfg, precision="fp32")
    rng = np.random.default_rng(0)
    tiles = rng.uniform(0, 255, size=(2, 256, 256, 3)).astype(np.uint8)
    res = model.eval_batch(tiles, batch_size=8, niter=40)
    assert len(res) == 2
    for m, cm in res:
        assert m.shape == (256, 256) and m.dtype == np.int32
    jax.clear_caches()
