#!/usr/bin/env bash
# Poll the TPU relay until it is healthy, then run the queued bench refresh
# (tools/refresh_bench.sh). Used when the round starts with a wedged relay so
# the TPU artifacts are captured the moment the tunnel recovers.
#
#   bash tools/wait_and_refresh.sh [max_attempts]
set -u
cd "$(dirname "$0")/.."
MAX=${1:-40}
for i in $(seq 1 "$MAX"); do
  echo "== probe attempt $i/$MAX ($(date -u +%H:%M:%S)) =="
  PYTHONPATH=/root/repo:/root/.axon_site python - <<'EOF'
import sys; sys.path.insert(0, ".")
from bench import _backend_watchdog
_backend_watchdog(600)
import jax
print("devices:", jax.devices())
EOF
  if [ $? -eq 0 ]; then
    echo "== relay healthy; running refresh_bench =="
    bash tools/refresh_bench.sh 2>&1
    exit $?
  fi
  sleep 600
done
echo "relay never recovered after $MAX attempts"
exit 17
