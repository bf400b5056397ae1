#!/bin/bash
# Round-5 (fresh relay) serialized TPU queue: the .jax_cache did not survive
# the round transition, so every bench-gated program must be re-warmed on
# THIS machine before the driver's end-of-round bench.
# Run detached:  setsid nohup bash scripts/r5_tpu_queue.sh > /tmp/r5_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

# 1. pack/e2e shape: bwt_v3 small+large @ 2^22 (the container format default)
echo "[queue] === warm_stream 16 22 === $(date)"
timeout 3600 python scripts/warm_stream.py 16 22

# 2. headline shape: 64 x 1 MiB streamed (141.5 MB/s, PERF.md round-5 sweep);
#    marker ends pointing here
echo "[queue] === warm_stream 64 20 === $(date)"
timeout 3600 python scripts/warm_stream.py 64 20

# 3. a6 scoreboard (byte+var transform @ 2^24, var inverse, 4 MiB pipelined,
#    all_coded fallback)
echo "[queue] === warm_a6 24 === $(date)"
timeout 7200 python scripts/warm_a6.py 24

# 4. early bench refresh: prove the warmed stages produce a full line even if
#    the rest of the queue is cut off
echo "[queue] === bench refresh (early) === $(date)"
timeout 1200 python bench.py > /tmp/bench_r5_early.json 2> /tmp/bench_r5_early.log
echo "[queue] early bench:"; cat /tmp/bench_r5_early.json
echo "[queue] done at $(date)"
