#!/bin/bash
# One-shot TPU work queue for when the axon tunnel is reachable:
#   1. bench.py      — headline numbers + warm /tmp/jax_cache
#   2. tpu_smoke.py  — drive the six CLIs on the real chip -> VERIFIED.md
#   3. tune_stage3.py — MFU sweep toward the >=40% BASELINE bar
# Each step is independently timed and logged; a wedged tunnel fails fast
# via bench's probe.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_session}
mkdir -p "$LOG"

echo "== probe =="
if ! timeout 240 env _BENCH_CHILD=probe python bench.py; then
    echo "tunnel not reachable; aborting"; exit 3
fi

echo "== bench =="
timeout 6000 python bench.py | tee "$LOG/bench.json"

echo "== cli smoke (tpu) =="
timeout 9000 python tools/tpu_smoke.py --workdir /tmp/sgfr_smoke_tpu \
    --timeout 2400 | tee "$LOG/smoke.log"

echo "== mfu sweep =="
timeout 9000 python tools/tune_stage3.py --batches 128 256 512 \
    --remat 0 1 --out "$LOG/tune.md" | tee "$LOG/tune.log"

echo "== done; artifacts in $LOG =="
