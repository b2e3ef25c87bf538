"""Device-trace profile of the bare ViT-L forward (100x256^2 bf16).

Same xplane parsing as tools/profile_tpu.py but traces only the network
forward, so the op list is not diluted by dynamics/QC ops.
"""

import argparse
import glob
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/cp_fwd_trace")
    ap.add_argument("--top", type=int, default=45)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    cfg = ClassTransformerConfig(n_cell_classes=6, dtype="bfloat16")
    model = ClassposeModel(cfg=cfg, precision="bf16")

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        rng.normal(size=(4, 25, 3, 256, 256)).astype(np.float32),
        jnp.bfloat16,
    )

    @jax.jit
    def fwd(t):
        def one(chunk):
            y, _ = model._apply(chunk)
            return y
        return jax.vmap(one)(t)

    def run():
        return float(
            jnp.sum(fwd(tiles)[0, 0, 0, 0, :8].astype(jnp.float32))
        )

    run()
    t0 = time.time()
    run()
    wall = time.time() - t0
    print(f"fwd wall: {wall * 1e3:.0f} ms", flush=True)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        run()

    paths = sorted(
        glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    totals: dict = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            if "xla op" not in lname and "ops" != lname and \
                    "xla modules" in lname:
                continue
            if "step" in lname or "module" in lname:
                continue
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, "?")
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e9

    items = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"device op total: {sum(totals.values()):.0f} ms\n")
    for name, ms in items[: args.top]:
        print(f"  {ms:8.2f} ms  {name[:160]}")


if __name__ == "__main__":
    main()
