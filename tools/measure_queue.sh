#!/bin/bash
# Round-3 TPU measurement queue — run SOLO (no pytest / other compiles;
# the 1-CPU host distorts concurrent measurements) once the axon tunnel
# is back. Logs land in /tmp/mq/. Order: cheapest-to-interpret first.
set -u
mkdir -p /tmp/mq
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

if ! probe; then
  echo "TPU tunnel down — aborting" >&2
  exit 1
fi

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${MQ_TIMEOUT:-1200}" "$@" > "/tmp/mq/$name.log" 2>&1
  echo "--- exit $? ---"
  tail -20 "/tmp/mq/$name.log"
}

run fwd_ab     python tools/bench_fwd_ab.py
run attn_micro python tools/attn_micro.py
run get_masks  python tools/bench_get_masks.py
run vit_stages python tools/bench_vit_stages.py
run bench      python bench.py
run bench_tb8  env CLASSPOSE_BENCH_TILE_BATCH=8 python bench.py
# end-to-end at ~3 GB of real tiled JPEG (VERDICT r2 item 6 asks >=2 GB):
# host decode + streaming + fused device path + polygons + exports
MQ_TIMEOUT=5400 run slide32k python tools/bench_slide.py --size 32768 --reuse \
    --checkpoint "$HOME/.cache/classpose_tpu/bench_ckpt.npz"
echo "queue done — inspect /tmp/mq/*.log; flip winning env defaults, then re-run bench.py"
