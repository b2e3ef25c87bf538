"""Worker for the 2-process jax.distributed CPU test (run by
tests/test_multiprocess.py, one subprocess per rank).

Exercises the multi-process primitives end-to-end: setup_distributed from
torchrun-style env vars, >64 KB broadcast_object (the old fixed buffer
truncated), allgather_object, and a real 2-epoch train_class_seg over a
2-device global mesh with uneven validation shards, rank-0-only
checkpoint writes and per-rank RNG states in the checkpoint meta.
"""

import json
import os
import sys

# CLASSPOSE_TEST_LOCAL_DEVICES>1 exercises the multi-device-per-process
# config (global mesh = world_size x local devices, like one v5e host
# per process)
_NLOC = int(os.environ.get("CLASSPOSE_TEST_LOCAL_DEVICES", "1"))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={_NLOC}"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main(out_dir: str) -> None:
    from classpose_tpu.parallel.distributed import (
        all_reduce_sum,
        allgather_object,
        broadcast_object,
        setup_distributed,
    )

    ctx = setup_distributed()
    assert ctx.world_size == 2, ctx
    assert len(jax.devices()) == 2 * _NLOC
    assert len(jax.local_devices()) == _NLOC

    # broadcast an object far beyond the old 64 KB buffer
    blob = {"data": b"x" * 200_000, "n": 7} if ctx.rank == 0 else None
    out = broadcast_object(blob)
    assert len(out["data"]) == 200_000 and out["n"] == 7

    got = allgather_object({"rank": ctx.rank})
    assert [g["rank"] for g in got] == [0, 1]

    s = all_reduce_sum(np.array([ctx.rank + 1.0]))
    assert float(s[0]) == 3.0

    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.runner import ClassposeModel
    from classpose_tpu.train.dataset import ClassposeTrainingDataset
    from classpose_tpu.train.train import train_class_seg

    rng = np.random.default_rng(0)  # same data on both ranks
    imgs = rng.uniform(0, 255, size=(8, 3, 64, 64)).astype(np.float32)
    labs = np.zeros((8, 5, 64, 64), np.float32)
    labs[:, 0, 10:30, 10:30] = 1
    labs[:, 1, 10:30, 10:30] = 1
    labs[:, 2] = labs[:, 0] > 0
    ds = ClassposeTrainingDataset(imgs, labs, bsize=64, augment=False)
    # 3 validation samples over 2 ranks → uneven shards, so the logged
    # value is only right if the sums are globally all-reduced
    val_ds = ClassposeTrainingDataset(imgs[:3], labs[:3], bsize=64,
                                      augment=False)

    cfg = ClassTransformerConfig(
        n_cell_classes=2, embed_dim=32, depth=1, num_heads=2, neck_dim=16,
        bsize=64,
    )
    model = ClassposeModel(cfg=cfg, precision="fp32")  # deterministic init

    path, train_losses, test_losses = train_class_seg(
        model, ds, test_dataset=val_ds, batch_size=2, n_epochs=2,
        learning_rate=1e-3, save_path=out_dir, model_name="mp",
        validate_every_epoch=True,
    )

    if os.environ.get("CLASSPOSE_TEST_LIGHT") == "1":
        # multi-device-per-process variant: the first train run already
        # proves the 2x2 global mesh (grad psum across processes AND
        # local devices); skip the resume runs to bound test time
        print(
            "RESULT "
            + json.dumps(
                {
                    "rank": ctx.rank,
                    "path": path,
                    "train_losses": [float(v) for v in train_losses],
                    "test_losses": [float(v) for v in test_losses],
                }
            ),
            flush=True,
        )
        return

    # --- resume continuity (VERDICT r2 item 9): a 4-epoch straight run
    # and a 2-epoch run resumed for 2 more must produce identical loss
    # trajectories — this only holds if optimizer/aggregator state AND
    # the per-rank RNG + sampler streams are restored exactly
    # (reference train.py:571-602)
    model_a = ClassposeModel(cfg=cfg, precision="fp32")
    _, straight4, _ = train_class_seg(
        model_a, ds, test_dataset=None, batch_size=2, n_epochs=4,
        learning_rate=1e-3, save_path=out_dir + "/straight",
        model_name="mp4",
    )
    model_b = ClassposeModel(cfg=cfg, precision="fp32")
    _, first2, _ = train_class_seg(
        model_b, ds, test_dataset=None, batch_size=2, n_epochs=2,
        learning_rate=1e-3, save_path=out_dir + "/resumable",
        model_name="mp2",
    )
    model_c = ClassposeModel(cfg=cfg, precision="fp32")
    _, resumed, _ = train_class_seg(
        model_c, ds, test_dataset=None, batch_size=2, n_epochs=4,
        learning_rate=1e-3, save_path=out_dir + "/resumable",
        model_name="mp2",
        resume_checkpoint=out_dir
        + "/resumable/mp2/checkpoint_last.train",
    )

    print(
        "RESULT "
        + json.dumps(
            {
                "rank": ctx.rank,
                "path": path,
                "train_losses": [float(v) for v in train_losses],
                "test_losses": [float(v) for v in test_losses],
                "straight4": [float(v) for v in straight4],
                "first2": [float(v) for v in first2],
                "resumed": [float(v) for v in resumed],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main(sys.argv[1])
