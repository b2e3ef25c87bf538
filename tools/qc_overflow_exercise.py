"""Exercise the QC instance-overflow redo path on the real chip
(VERDICT r4 item 5: "the QC overflow path exercised at least once").

Builds a structured checkpoint whose design field packs ~5.4k cells
into a 1024² tile — past the one-hot QC's K=4096 column budget — and
runs the production eval_batch. The device program must flag the
overflow (n_inst > K), the host must log the redo and re-run the tile
through the unbounded scatter QC, and the final masks must carry the
full instance count.
"""

import logging
import time

import numpy as np


def main():
    import jax

    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.nn.synthetic import structured_params
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel
    from classpose_tpu.runner.model import qc_max_instances

    logging.getLogger().setLevel(logging.INFO)
    enable_compilation_cache()

    cfg = ClassTransformerConfig(n_cell_classes=6, dtype="float32")
    params = structured_params(cfg, period=14, radius=5.5)
    model = ClassposeModel(cfg=cfg, precision="bf16")
    model.params = jax.device_put(
        jax.tree_util.tree_map(np.asarray, params)
    )

    rng = np.random.default_rng(0)
    tiles = rng.uniform(0, 255, size=(2, 1024, 1024, 3)).astype(np.uint8)

    k = qc_max_instances(1024 * 1024)
    print(f"QC ceiling at 1024²: K={k}; design field packs "
          f"~{(1024 // 14 + 1) ** 2} cells/tile", flush=True)

    t0 = time.time()
    out = model.eval_batch(tiles, batch_size=32, niter=200)
    wall = time.time() - t0
    counts = [int(m.max()) for m, _ in out]
    print(f"eval_batch wall {wall:.1f}s; instance counts {counts}",
          flush=True)
    assert any(c > k for c in counts), (
        f"overflow path NOT exercised: counts {counts} <= K={k}"
    )
    print("QC overflow redo exercised: counts exceed the one-hot K — "
          "the host routed the tiles through the unbounded scatter QC",
          flush=True)


if __name__ == "__main__":
    main()
