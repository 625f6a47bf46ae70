#!/usr/bin/env bash
# Watch the axon TPU relay and fire tools/refresh_bench.sh the moment it
# recovers (round-3 outage recovery, VERDICT r4 item 1). Designed to run in
# a tmux window:
#
#   tmux new-session -d -s relay 'bash tools/relay_watch.sh'
#
# Probes jax backend init with the bench watchdog every PERIOD seconds; on
# the first healthy probe it runs the full artifact refresh, tee'd to
# /tmp/refresh_bench_r4.log, and exits. Never SIGKILLs a tunnel client —
# the watchdog exits the probe process cleanly on timeout.
set -u
cd "$(dirname "$0")/.."
PERIOD=${1:-300}
LOG=${2:-/tmp/relay_watch.log}

while true; do
  echo "$(date -u +%FT%TZ) probing relay..." | tee -a "$LOG"
  if timeout 400 python - <<'EOF' >>"$LOG" 2>&1
import sys; sys.path.insert(0, ".")
from bench import _backend_watchdog
_backend_watchdog(300)
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
import jax.numpy as jnp
x = jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128), jnp.bfloat16))
print("relay healthy:", d, float(x))
EOF
  then
    echo "$(date -u +%FT%TZ) RELAY HEALTHY — running refresh_bench" | tee -a "$LOG"
    bash tools/refresh_bench.sh 2>&1 | tee /tmp/refresh_bench_r4.log
    echo "$(date -u +%FT%TZ) refresh_bench done rc=$?" | tee -a "$LOG"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) still wedged; sleeping $PERIOD" | tee -a "$LOG"
  sleep "$PERIOD"
done
