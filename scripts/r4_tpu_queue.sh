#!/bin/bash
# Round-4 serialized TPU queue: waits for any running measure_r3.py to exit,
# then re-warms/compiles the round-4 program shapes and refreshes the bench.
# Run detached:  setsid nohup bash scripts/r4_tpu_queue.sh > /tmp/r4_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "[queue] waiting for measure_r3.py (if running) ..."
while pgrep -f "measure_r3.py" > /dev/null 2>&1; do sleep 30; done
echo "[queue] TPU free at $(date)"

# 1. re-warm the production shape: the pipelined container now dispatches
#    (8, 2^22) units inside the 64 MiB e2e path (io/blocks PIPE_BLOCKS=8),
#    so the e2e warm recompiles that sub-shape; the (16, 2^22) bench program
#    itself is a cache hit (sources unchanged).
echo "[queue] === compile_blocks 16 22 (re-warm e2e incl. (8,2^22) units) ==="
timeout 9000 python scripts/compile_blocks_tpu.py 16 22

# 2. a6 scoreboard warm (VERDICT r4 #4) — BEFORE the sweep: cheaper compile,
#    and the a6 metric must not be lost to a round-end cutoff.
echo "[queue] === warm_a6 ==="
timeout 7200 python scripts/warm_a6.py 24

# 3. block-shape sweep (VERDICT r4 #2)
echo "[queue] === sweep: compile_blocks 32 21 ==="
timeout 9000 python scripts/compile_blocks_tpu.py 32 21
echo "[queue] === sweep: compile_blocks 64 20 ==="
timeout 9000 python scripts/compile_blocks_tpu.py 64 20

# 4. refresh the bench with everything warm
echo "[queue] === bench refresh ==="
timeout 1200 python bench.py > /tmp/bench_r4_refresh.json 2> /tmp/bench_r4_refresh.log
echo "[queue] bench wrote:"; cat /tmp/bench_r4_refresh.json
echo "[queue] done at $(date)"
