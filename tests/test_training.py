"""Training stack tests: samplers (determinism/coverage), losses, dataset
processing, and a real train_class_seg smoke run with a tiny network —
the reference's own trainer-test strategy (SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from classpose_tpu.train.samplers import (
    DistributedEpochSampler,
    SequentialDistributedSampler,
)
from classpose_tpu.train.losses import (
    aggregate_losses,
    loss_fn_class,
    loss_fn_seg,
    loss_fn_tversky,
)
from classpose_tpu.train.train_utils import (
    compute_oversampling_probabilities,
    get_class_weights,
    process_train_test,
)
from classpose_tpu.train.dataset import ClassposeTrainingDataset


# ------------------------------------------------------------------ samplers

def test_sampler_determinism_and_coverage():
    n, bs, world = 64, 4, 2
    samplers = [
        DistributedEpochSampler(n, bs, rank=r, num_replicas=world, seed=3)
        for r in range(world)
    ]
    a0 = samplers[0].local_indices(epoch=2)
    a0_again = DistributedEpochSampler(
        n, bs, rank=0, num_replicas=world, seed=3
    ).local_indices(epoch=2)
    np.testing.assert_array_equal(a0, a0_again)  # deterministic
    a1 = samplers[1].local_indices(epoch=2)
    assert set(a0) & set(a1) == set()  # disjoint
    assert set(a0) | set(a1) == set(range(n))  # full coverage
    assert len(a0) % bs == 0


def test_sampler_truncation_and_errors():
    s = DistributedEpochSampler(10, 4, rank=0, num_replicas=2, seed=0)
    assert len(s) == 4  # 10 → 8 usable → 4 per rank
    with pytest.raises(ValueError, match="full distributed batch"):
        DistributedEpochSampler(3, 4, rank=0, num_replicas=2)
    with pytest.raises(ValueError):
        DistributedEpochSampler(10, 4, rank=2, num_replicas=2)


def test_sampler_oversampling():
    probs = np.zeros(20)
    probs[5] = 1.0
    s = DistributedEpochSampler(
        20, 2, train_probs=probs, nimg_per_epoch=8, seed=0
    )
    assert set(s.local_indices()) == {5}


def test_sequential_sampler():
    parts = [
        SequentialDistributedSampler(10, rank=r, num_replicas=3).indices()
        for r in range(3)
    ]
    assert sum(parts, []) == list(range(10))


# -------------------------------------------------------------------- losses

def _fake_batch(B=2, C=3, H=32, W=32, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.normal(size=(B, C + 3, H, W)).astype(np.float32)
    lbl = np.zeros((B, 4, H, W), np.float32)
    lbl[:, 0] = rng.integers(0, C, size=(B, H, W))
    lbl[0, 0, :4, :4] = -100  # masked region
    lbl[:, 1] = rng.random((B, H, W)) > 0.5
    ang = rng.uniform(0, 2 * np.pi, size=(B, H, W))
    lbl[:, 2] = np.sin(ang) * lbl[:, 1]
    lbl[:, 3] = np.cos(ang) * lbl[:, 1]
    return jnp.asarray(y), jnp.asarray(lbl)


def test_loss_fn_class_matches_manual():
    y, lbl = _fake_batch()
    got = float(loss_fn_class(lbl, y))
    # manual masked CE
    import scipy.special

    logits = np.asarray(y[:, :-3])
    target = np.asarray(lbl[:, 0]).astype(int)
    logp = scipy.special.log_softmax(logits, axis=1)
    valid = target != -100
    t = np.where(valid, target, 0)
    picked = np.take_along_axis(logp, t[:, None], 1)[:, 0]
    expect = -(picked[valid]).mean()
    assert got == pytest.approx(expect, rel=1e-5)


def test_loss_fn_class_weighted():
    y, lbl = _fake_batch()
    w = np.array([1.0, 2.0, 0.5], np.float32)
    got = float(loss_fn_class(lbl, y, class_weights=w))
    assert np.isfinite(got) and got > 0


def test_loss_fn_seg_components():
    y, lbl = _fake_batch()
    got = float(loss_fn_seg(lbl, y))
    flows = np.asarray(y[:, -3:-1])
    mse = ((flows - 5 * np.asarray(lbl[:, -2:])) ** 2).mean() / 2
    logits = np.asarray(y[:, -1])
    t = (np.asarray(lbl[:, -3]) > 0.5).astype(np.float32)
    bce = np.mean(
        np.maximum(logits, 0) - logits * t + np.log1p(np.exp(-np.abs(logits)))
    )
    assert got == pytest.approx(mse + bce, rel=1e-5)


def test_tversky_bounds_and_perfect_prediction():
    y, lbl = _fake_batch()
    v = float(loss_fn_tversky(lbl, y, 3))
    assert 0 < v < 1
    # near-perfect prediction → small loss
    perfect = np.full(np.asarray(y).shape, -20.0, np.float32)
    t = np.asarray(lbl[:, 0]).astype(int)
    tt = np.where(t == -100, 0, t)
    for b in range(2):
        for c in range(3):
            perfect[b, c][tt[b] == c] = 20.0
    v2 = float(loss_fn_tversky(lbl, jnp.asarray(perfect), 3))
    assert v2 < 0.2


def test_aggregate_losses():
    lv = jnp.zeros(3)
    losses = jnp.array([1.0, 2.0, 3.0])
    assert float(aggregate_losses(lv, losses, optimise=False)) == 6.0
    assert float(aggregate_losses(lv, losses, optimise=True)) == 6.0
    lv2 = jnp.array([0.0, 1.0, 0.0])
    v = float(aggregate_losses(lv2, losses, optimise=True))
    assert v == pytest.approx(1 + 2 * np.exp(-1) + 1 + 3, rel=1e-5)


# --------------------------------------------------------------- data utils

def test_class_weights_and_oversampling_probs():
    counts = np.array([1000, 10, 100, 0])
    w = get_class_weights(counts)
    assert w[3] == 0
    assert w[1] > w[2] > w[0]
    inst = np.array([[0, 5, 0, 0], [0, 0, 3, 0]])
    p = compute_oversampling_probabilities(counts, inst)
    assert p.sum() == pytest.approx(1.0)
    assert p[0] > p[1]  # sample 0 has the rarer class instances


def _disc_sample(seed, H=96, W=96, n=4, n_classes=3):
    rng = np.random.default_rng(seed)
    inst = np.zeros((H, W), np.float32)
    cls = np.zeros((H, W), np.float32)
    yy, xx = np.mgrid[:H, :W]
    k = 0
    for _ in range(n):
        r = rng.integers(8, 13)
        cy, cx = rng.integers(r, H - r), rng.integers(r, W - r)
        m = ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r) & (inst == 0)
        if m.sum() < 10:
            continue
        k += 1
        inst[m] = k
        cls[m] = rng.integers(1, n_classes)
    img = np.stack([200 - 50 * (inst > 0)] * 3).astype(np.float32)
    return img, np.stack([inst, cls])


def test_process_train_test():
    data, labels = zip(*[_disc_sample(i) for i in range(4)])
    (tr_d, tr_l, tr_diam, *_rest) = process_train_test(
        list(data), list(labels), min_train_masks=1
    )
    assert len(tr_d) == len(tr_l) == len(tr_diam)
    lab = tr_l[0]
    assert lab.shape[0] == 5  # instance, class, binary, fy, fx
    inst, cls, binary, fy, fx = lab
    assert set(np.unique(binary)) <= {0.0, 1.0}
    # sparse-annotation masking: class==-100 only where inconsistent
    assert ((cls == -100) <= ((inst > 0) != (cls > 0))).all()
    mag = np.sqrt(fy**2 + fx**2)
    # unit flows except at instance centers (zero-gradient fixed points)
    assert np.median(mag[inst > 0]) > 0.9
    assert (mag[inst > 0] < 0.5).mean() < 0.05


# ------------------------------------------------------------- train smoke

def test_train_class_seg_smoke(tmp_path):
    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.runner import ClassposeModel
    from classpose_tpu.train.train import train_class_seg

    data, labels = zip(*[_disc_sample(i, n_classes=3) for i in range(8)])
    (tr_d, tr_l, tr_diam, *_ ) = process_train_test(
        list(data), list(labels), min_train_masks=1
    )
    ds = ClassposeTrainingDataset(
        np.stack(tr_d), np.stack(tr_l), diameter_array=tr_diam, bsize=64
    )
    cfg = ClassTransformerConfig(
        n_cell_classes=3, embed_dim=32, depth=1, num_heads=2, neck_dim=16,
        bsize=64,
    )
    model = ClassposeModel(cfg=cfg, precision="fp32")
    path, tl, vl = train_class_seg(
        model,
        ds,
        test_dataset=ds.subset(range(2)),
        batch_size=8,
        n_epochs=2,
        learning_rate=1e-4,
        save_path=str(tmp_path),
        model_name="toy",
        use_uncertainty_weighting=True,
        validate_every_epoch=True,
        config_snapshot={"note": "smoke"},
    )
    assert (tmp_path / "toy" / "toy.npz").exists()
    assert (tmp_path / "toy" / "checkpoint_last.train" / "meta.json").exists()
    assert (tmp_path / "toy" / "checkpoint_best.train" / "meta.json").exists()
    assert np.isfinite(tl[:2]).all()

    # resume for one more epoch
    model2 = ClassposeModel(cfg=cfg, precision="fp32")
    path2, tl2, _ = train_class_seg(
        model2,
        ds,
        batch_size=8,
        n_epochs=3,
        learning_rate=1e-4,
        save_path=str(tmp_path),
        model_name="toy_resumed",
        resume_checkpoint=str(tmp_path / "toy" / "checkpoint_last.train"),
        use_uncertainty_weighting=True,
    )
    assert np.isfinite(tl2[2])
    # resume exhausted → error
    with pytest.raises(ValueError, match="no training steps"):
        train_class_seg(
            ClassposeModel(cfg=cfg, precision="fp32"),
            ds,
            batch_size=8,
            n_epochs=2,
            save_path=str(tmp_path),
            model_name="toy_bad",
            resume_checkpoint=str(
                tmp_path / "toy" / "checkpoint_last.train"
            ),
            use_uncertainty_weighting=True,
        )
