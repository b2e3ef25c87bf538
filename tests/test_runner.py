"""Runner tests: tiled forward contract and ClassposeModel.eval pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from classpose_tpu.nn import ClassTransformerConfig
from classpose_tpu.runner import ClassposeModel, compute_class_masks, run_net
from classpose_tpu.runner.model import convert_image, dx_to_circ

TINY_CFG = ClassTransformerConfig(
    n_cell_classes=4, embed_dim=32, depth=1, num_heads=2, neck_dim=16,
    bsize=64, ps=8,
)


def _model():
    return ClassposeModel(cfg=TINY_CFG, precision="fp32", params=None,
                          pretrained_model=None)


def test_run_net_contract():
    model = _model()
    imgs = np.random.default_rng(0).normal(size=(2, 100, 130, 3)).astype(
        np.float32
    )
    yf, y_classf, styles = run_net(
        model._apply, imgs, n_cell_classes=4, bsize=64, batch_size=4
    )
    assert yf.shape == (2, 100, 130, 3)
    assert y_classf.shape == (2, 100, 130, 4)
    assert styles.shape == (2, 256)
    assert np.isfinite(yf).all()


def test_eval_single_image_contract():
    model = _model()
    img = np.random.default_rng(1).uniform(0, 255, size=(80, 90, 3)).astype(
        np.float32
    )
    masks, flows, class_masks, styles = model.eval(
        img, bsize=64, niter=20, min_size=1
    )
    assert masks.shape == (80, 90)
    rgb, dP, cellprob, y_class, shape = flows
    assert dP.shape == (2, 80, 90)
    assert cellprob.shape == (80, 90)
    assert y_class.shape == (4, 80, 90)
    assert rgb.shape == (80, 90, 3) and rgb.dtype == np.uint8
    assert class_masks.shape == masks.shape
    # class labels only on instances
    assert (class_masks[masks == 0] == 0).all()


def test_eval_list_dispatch():
    model = _model()
    imgs = [
        np.random.default_rng(i).uniform(size=(70, 70, 3)).astype(np.float32)
        for i in range(2)
    ]
    masks, flows, class_masks, styles = model.eval(imgs, bsize=64, niter=10)
    assert len(masks) == 2 and len(model.timing) == 2


def test_eval_gray_and_channel_first():
    model = _model()
    gray = np.random.default_rng(2).uniform(size=(65, 66)).astype(np.float32)
    masks, *_ = model.eval(gray, bsize=64, niter=10)
    assert masks.shape == (65, 66)
    chw = np.random.default_rng(3).uniform(size=(3, 65, 66)).astype(np.float32)
    masks2, *_ = model.eval(chw, bsize=64, niter=10)
    assert masks2.shape == (65, 66)


def test_convert_image_variants():
    assert convert_image(np.zeros((10, 12))).shape == (10, 12, 3)
    assert convert_image(np.zeros((3, 10, 12))).shape == (10, 12, 3)
    assert convert_image(np.zeros((10, 12, 2))).shape == (10, 12, 3)
    assert convert_image(np.zeros((10, 12, 5))).shape == (10, 12, 3)


def test_compute_class_masks_majority():
    masks = np.zeros((10, 10), np.int32)
    masks[:5, :5] = 1
    masks[6:, 6:] = 2
    y_class = np.zeros((3, 10, 10), np.float32)
    y_class[1, :5, :5] = 5.0  # instance 1 → class 1
    y_class[2, 6:, 6:] = 5.0  # instance 2 → class 2
    # add minority noise inside instance 1
    y_class[2, 0, 0] = 10.0
    cm, uniq = compute_class_masks(masks, y_class)
    assert (cm[masks == 1] == 1).mean() > 0.9  # majority vote wins
    assert (cm[masks == 2] == 2).all()
    assert (cm[masks == 0] == 0).all()


def test_class_vote_native_matches_numpy(monkeypatch):
    """The C++ class_vote must match the numpy bincount vote exactly,
    including argmax tie-breaks (first max wins) and background zeros."""
    from classpose_tpu import native as native_mod
    from classpose_tpu.runner.model import compute_class_masks_from_pixels

    if native_mod.load_geomfast() is None:
        import pytest

        pytest.skip("native geom core unavailable")

    rng = np.random.default_rng(5)
    for n_classes in (2, 6):
        masks = rng.integers(0, 40, (97, 130)).astype(np.int32)
        pix = rng.integers(0, n_classes, masks.shape).astype(np.int8)
        got = compute_class_masks_from_pixels(masks, pix, n_classes)
        monkeypatch.setattr(native_mod, "load_geomfast", lambda: None)
        want = compute_class_masks_from_pixels(masks, pix, n_classes)
        monkeypatch.undo()
        np.testing.assert_array_equal(got, want)
    # tie-break: equal counts → lowest class index, like np.argmax
    masks = np.zeros((4, 4), np.int32)
    masks[:2] = 1
    pix = np.zeros((4, 4), np.int8)
    pix[0] = 2
    pix[1] = 1  # classes 1 and 2 tie with 4 pixels each
    got = compute_class_masks_from_pixels(masks, pix, 3)
    assert (got[masks == 1] == 1).all()


def test_tta_augment_path():
    model = _model()
    img = np.random.default_rng(4).uniform(size=(70, 70, 3)).astype(
        np.float32
    )
    masks, flows, *_ = model.eval(img, bsize=64, niter=10, augment=True)
    assert masks.shape == (70, 70)
    assert np.isfinite(flows[1]).all()
