#!/usr/bin/env bash
# One-shot refresh of every TPU-measured artifact, queued during the round-3
# relay outage (PERF.md "Relay outage note"). Run on a healthy tunnel:
#
#   bash tools/refresh_bench.sh
#
# Produces/updates:
#   - BENCH_TABLE.md (all rows incl. triplet_resnet50_224) + one JSON line
#   - serving-path latency/throughput table (paste into docs/serving.md)
# -e is load-bearing: consumers (relay_watch.sh) treat exit 0 as "refresh
# succeeded" and auto-commit the artifacts — a failed bench step must abort.
set -euo pipefail
cd "$(dirname "$0")/.."

# Single-flight: two recovery watchers firing at once would contend on the
# one TPU chip and corrupt every number. First one in wins; later entrants
# exit loudly.
exec 9>/tmp/refresh_bench.lock
if ! flock -n 9; then
  echo "refresh_bench: another refresh is already running (lock held); exiting" >&2
  exit 3
fi

# Capture contract (VERDICT r4 item 6): the round-4 refresh ran to completion
# but its measurements lived only in /tmp because capture depended on WHICH
# entry point launched it (relay_watch.sh committed; a manual run didn't).
# The script itself now owns capture: every run tees into perf_runs/ and a
# successful run commits the log + regenerated tables, regardless of caller.
mkdir -p perf_runs
LOG="perf_runs/$(date -u +%Y-%m-%d_%H%M)_refresh.log"
exec > >(tee "$LOG") 2>&1
commit_on_success() {
  rc=$?
  if [ $rc -eq 0 ]; then
    git add "$LOG" BENCH_TABLE.md 2>/dev/null || true
    git commit -m "Bench refresh: capture $(basename "$LOG") + BENCH_TABLE" \
      --only "$LOG" BENCH_TABLE.md >/dev/null 2>&1 \
      && echo "refresh_bench: committed $LOG + BENCH_TABLE.md" \
      || echo "refresh_bench: nothing new to commit (tables unchanged)"
  else
    echo "refresh_bench: FAILED (rc=$rc); log kept uncommitted at $LOG" >&2
  fi
}
trap commit_on_success EXIT

echo "== backend probe (fails fast if the relay is wedged) =="
timeout 700 python - <<'EOF'
import sys; sys.path.insert(0, ".")
from bench import _backend_watchdog
_backend_watchdog(600)
import jax
print("devices:", jax.devices())
EOF

echo "== bench table (writes BENCH_TABLE.md; ~20-30 min of compiles) =="
python bench.py --table

echo "== serving bench (chip path + online HTTP micro-batching path + int8 A/B) =="
python tools/bench_serving.py --calls 20 --http --int8

echo "== 224px residual attribution + candidate A/B (VERDICT r4 item 2) =="
python tools/profile_224_residual.py --img 224

echo "Done. Log + BENCH_TABLE auto-committed; reconcile README.md / PERF.md / docs/serving.md prose against the new numbers."
