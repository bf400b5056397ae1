#!/bin/bash
# Round-5 phase-2 serialized TPU queue: waits for the phase-1 warm queue,
# then probes the streamed block-size knee (512/256 KiB, never measured —
# PERF.md round-5 sweep stops at 1 MiB), attempts the it2 decision
# measurement, warms the whole-file v3 bench stages, and refreshes bench.
# Run detached:  setsid nohup bash scripts/r5_tpu_queue2.sh > /tmp/r5_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[queue2] waiting for phase-1 queue (pid $WAIT_PID) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "[queue2] TPU free at $(date)"

# TPU liveness probe: after any killed/hung TPU client the relay wedges for
# ~20 min — retry a trivial op until it answers before the next real job.
probe() {
  for _ in $(seq 1 30); do
    if timeout 180 python -c "import jax, jax.numpy as jnp; print(int(jnp.arange(8).sum()))" >/dev/null 2>&1; then
      echo "[queue2] TPU responsive at $(date)"; return 0
    fi
    echo "[queue2] TPU unresponsive, sleeping 60s ($(date))"; sleep 60
  done
  echo "[queue2] TPU never recovered"; return 1
}

# 1. streamed knee probe (512 KiB / 256 KiB blocks).  warm_stream itself
#    keeps the best-shape marker (best-mbps-wins), so a slower probe cannot
#    demote the headline shape.
echo "[queue2] === warm_stream 128 19 --small-only === $(date)"
timeout 2400 python scripts/warm_stream.py 128 19 --small-only || probe
echo "[queue2] === warm_stream 256 18 --small-only === $(date)"
timeout 2400 python scripts/warm_stream.py 256 18 --small-only || probe

# 2. the it2 decision measurement (VERDICT r4 #1).  Under timeout: a hang
#    is killed and the probe loop waits out the relay wedge.
echo "[queue2] === it2 2^22 === $(date)"
ARCHON_IT2_DEBUG=1 timeout 2400 python scripts/measure_r5.py it2 22 || probe

# 3. whole-file v3 bench stages (stage1 2^24, stage2 2^26) so the driver's
#    round-end bench is execute-only there too
echo "[queue2] === v3 warm 2^24 === $(date)"
BENCH_IMPL=v3 BENCH_SIZE=$((1<<24)) BENCH_BUDGET=600 timeout 900 python bench.py || probe
echo "[queue2] === v3 warm 2^26 === $(date)"
BENCH_IMPL=v3 BENCH_SIZE=$((1<<26)) BENCH_BUDGET=600 timeout 900 python bench.py || probe

# 4. final full bench refresh with everything warm
echo "[queue2] === bench refresh (final) === $(date)"
timeout 1200 python bench.py > /tmp/bench_r5_final.json 2> /tmp/bench_r5_final.log
echo "[queue2] final bench:"; cat /tmp/bench_r5_final.json
echo "[queue2] done at $(date)"
