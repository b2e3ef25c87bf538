"""Device-trace profiler for the production batched path.

Runs eval_batch on the TPU under jax.profiler, then parses the xplane
trace with tensorboard_plugin_profile and prints the top device ops by
self time plus a coarse stage attribution (ViT forward / follow_flows /
QC sweeps / diffusion / blend+normalize / copies).

Usage: python tools/profile_tpu.py [--tiles 4] [--out /tmp/cp_trace]

Axon note (CLAUDE.md): block_until_ready is a no-op on the tunnel;
eval_batch's np.asarray readbacks force real completion, so traced device
spans are correct. Run solo — concurrent processes distort everything.
"""

import argparse
import glob
import json
import os
import re
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=4)
    ap.add_argument("--out", default="/tmp/cp_trace")
    ap.add_argument("--top", type=int, default=40)
    default_ckpt = os.path.expanduser(
        "~/.cache/classpose_tpu/bench_ckpt.npz"
    )
    ap.add_argument(
        "--ckpt",
        default=default_ckpt,
        help="structured checkpoint (tools/make_bench_ckpt.py) so the "
        "dynamics/QC stages run at real data-dependent cost; pass '' "
        "for a random init",
    )
    args = ap.parse_args()

    if args.ckpt and not os.path.exists(args.ckpt):
        if args.ckpt != default_ckpt:
            raise SystemExit(
                f"--ckpt {args.ckpt} does not exist; refusing to fall "
                "back to a random init (its near-zero instance count "
                "profiles dynamics/QC at their floor)"
            )
        print(
            f"WARNING: bench ckpt not found at {args.ckpt}; profiling a "
            "RANDOM INIT — dynamics/QC stages run at their floor, not "
            "the structured-checkpoint workload. Build it with "
            "tools/make_bench_ckpt.py.",
            flush=True,
        )
        args.ckpt = ""

    import numpy as np
    import jax

    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    if args.ckpt and os.path.exists(args.ckpt):
        print("using structured ckpt", args.ckpt)
        model = ClassposeModel(pretrained_model=args.ckpt,
                               precision="bf16")
    else:
        cfg = ClassTransformerConfig(n_cell_classes=6, dtype="bfloat16")
        model = ClassposeModel(cfg=cfg, precision="bf16")

    rng = np.random.default_rng(0)
    tiles = rng.uniform(
        0, 255, size=(args.tiles, 1024, 1024, 3)
    ).astype(np.uint8)

    def run_once():
        return model.eval_batch(tiles, batch_size=32, niter=200)

    print("warmup/compile ...", flush=True)
    t0 = time.time()
    run_once()
    print(f"warmup {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    run_once()
    wall = time.time() - t0
    print(f"steady-state wall: {wall:.2f}s = "
          f"{args.tiles / wall:.2f} tiles/s", flush=True)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        run_once()

    # ---- parse the xplane ----
    paths = sorted(
        glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no xplane found under", args.out)
        return
    xplane = paths[-1]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        xs.ParseFromString(f.read())

    # collect per-op self-times from TPU device planes (XLA op lines)
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
                dur = ev.duration_ps / 1e9  # ms
                totals[name] = totals.get(name, 0.0) + dur
    if not totals:
        print("no device op events parsed; planes seen:")
        for plane in xs.planes:
            print("  plane:", plane.name,
                  [ln.name for ln in plane.lines][:8])
        return

    items = sorted(totals.items(), key=lambda kv: -kv[1])
    dev_total = sum(totals.values())
    print(f"\ndevice op total: {dev_total:.0f} ms "
          f"(wall {wall * 1e3:.0f} ms)\n")

    def bucket(name: str) -> str:
        n = name.lower()
        if "fusion" in n or True:
            pass
        if re.search(r"attn|flash|pallas|custom-call", n):
            return "attention-kernel"
        if re.search(r"conv", n):
            return "conv"
        if re.search(r"dot|einsum|gemm", n):
            return "matmul"
        if re.search(r"gather", n):
            return "gather"
        if re.search(r"scatter", n):
            return "scatter"
        if re.search(r"copy|transpose|bitcast-convert", n):
            return "copy/transpose"
        if re.search(r"convert", n):
            return "convert"
        if re.search(r"reduce-window", n):
            return "reduce-window"
        if re.search(r"sort|top-k", n):
            return "sort/topk"
        if re.search(r"while|fusion", n):
            return "fusion/while"
        return "other"

    buckets: dict = {}
    for name, ms in totals.items():
        buckets[bucket(name)] = buckets.get(bucket(name), 0.0) + ms
    print("== buckets ==")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {v:8.1f} ms  {k}")

    print(f"\n== top {args.top} ops ==")
    for name, ms in items[: args.top]:
        print(f"  {ms:8.1f} ms  {name[:140]}")

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({"wall_s": wall, "totals_ms": totals}, f)


if __name__ == "__main__":
    main()
