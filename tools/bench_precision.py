"""bf16-vs-fp32 accuracy delta on realistic tiles (VERDICT r3 item 6).

Runs the production eval_batch at BOTH precisions on 1024² tiles through
the full-size ViT-L with a perturbed structured checkpoint (designed
cell field + input-dependent ripple, nn/synthetic.py), then reports
mask-count / detection-F1 / class-agreement deltas via metrics/drift.py.

Precision semantics match the reference: bf16 is the pipeline default,
fp32 the parity anchor (/root/reference/src/classpose/models.py:37-69).

Usage: python tools/bench_precision.py [--tiles 4] [--amp 0.06]
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=2)
    ap.add_argument("--ripple", type=float, default=0.5,
                    help="input-driven field wobble in decoded units "
                    "(flows are +-5)")
    ap.add_argument("--niter", type=int, default=200)
    args = ap.parse_args()

    import numpy as np

    from classpose_tpu.metrics.drift import (
        aggregate_agreement,
        detection_class_agreement,
    )
    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.nn.synthetic import perturbed_structured_params
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    cfg32 = ClassTransformerConfig(n_cell_classes=6, dtype="float32")
    params = perturbed_structured_params(cfg32, ripple=args.ripple,
                                         seed=0)
    cfg16 = ClassTransformerConfig(n_cell_classes=6, dtype="bfloat16")

    rng = np.random.default_rng(1)
    tiles = rng.uniform(
        0, 255, size=(args.tiles, 1024, 1024, 3)
    ).astype(np.uint8)

    results = {}
    for name, cfg, prec in (("fp32", cfg32, "fp32"),
                            ("bf16", cfg16, "bf16")):
        model = ClassposeModel(cfg=cfg, precision=prec, params=params)
        # fp32 takes the XLA attention path, which materializes the
        # (chunk, heads, L, L) f32 bias — chunk 4 keeps it ~0.5 GB/tile;
        # bf16 runs the VMEM-resident Pallas kernel at the full grid
        out = model.eval_batch(
            tiles, batch_size=4 if prec == "fp32" else 32,
            niter=args.niter,
        )
        results[name] = out
        n = sum(int(m.max()) for m, _ in out)
        print(f"{name}: {n} instances over {args.tiles} tiles",
              flush=True)

    per_tile = [
        detection_class_agreement(ma, mb, ca, cb)
        for (ma, ca), (mb, cb) in zip(results["fp32"], results["bf16"])
    ]
    agg = aggregate_agreement(per_tile)
    print(json.dumps({
        "metric": "bf16_vs_fp32_drift",
        "ripple": args.ripple,
        "per_tile": per_tile,
        "aggregate": agg,
    }, default=float))


if __name__ == "__main__":
    main()
