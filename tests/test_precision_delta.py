"""bf16-vs-fp32 drift gate at tiny geometry (VERDICT r3 item 6).

The full-size numbers live in ROADMAP (tools/bench_precision.py on the
TPU); this test gates the same pipeline at a CPU-affordable geometry:
a perturbed structured checkpoint (designed cells + input-dependent
ripple) through eval_batch at both precisions, instance-paired via
IoU>0.5. bf16 may move boundary pixels, but detection and per-cell
classes must be stable."""

import numpy as np
import pytest

from classpose_tpu.metrics.drift import (
    aggregate_agreement,
    detection_class_agreement,
)
from classpose_tpu.nn import ClassTransformerConfig
from classpose_tpu.nn.synthetic import perturbed_structured_params
from classpose_tpu.runner import ClassposeModel

CFG = dict(
    n_cell_classes=6, ps=4, embed_dim=64, depth=2, num_heads=4,
    neck_dim=64, bsize=64,
)


@pytest.fixture(scope="module")
def drift_results():
    cfg32 = ClassTransformerConfig(dtype="float32", **CFG)
    params = perturbed_structured_params(cfg32, ripple=0.5, seed=0)
    cfg16 = ClassTransformerConfig(dtype="bfloat16", **CFG)

    rng = np.random.default_rng(1)
    tiles = rng.uniform(0, 255, size=(6, 128, 128, 3)).astype(np.uint8)

    out = {}
    for name, cfg, prec in (("fp32", cfg32, "fp32"),
                            ("bf16", cfg16, "bf16")):
        model = ClassposeModel(cfg=cfg, precision=prec, params=params)
        out[name] = model.eval_batch(tiles, batch_size=8, niter=32)
    return out


def test_fp32_run_finds_the_designed_cells(drift_results):
    n = sum(int(m.max()) for m, _ in drift_results["fp32"])
    # 6 tiles × 16 period-32 cells per 128² tile, some may merge/fail QC
    assert n >= 60, f"fp32 found only {n} instances"


def test_bf16_detection_and_class_drift_bounded(drift_results):
    per_tile = [
        detection_class_agreement(ma, mb, ca, cb)
        for (ma, ca), (mb, cb) in zip(
            drift_results["fp32"], drift_results["bf16"]
        )
    ]
    agg = aggregate_agreement(per_tile)
    assert agg["detection_f1"] >= 0.97, agg
    assert agg["count_delta_frac"] <= 0.03, agg
    if agg["class_agreement"] is not None:
        assert agg["class_agreement"] >= 0.99, agg


def test_agreement_helper_self_identity(drift_results):
    masks, cm = drift_results["fp32"][0]
    d = detection_class_agreement(masks, masks, cm, cm)
    assert d["f1"] == 1.0
    assert d["count_delta_frac"] == 0.0
    if d["tp"]:
        assert d["class_agreement"] == 1.0
