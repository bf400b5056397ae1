"""Benchmark: forward BWT throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

vs_baseline is measured against the 500 MB/s/chip north-star target from
BASELINE.md (the reference publishes no absolute numbers).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MBPS = 500.0


def main():
    size = int(os.environ.get("BENCH_SIZE", 1 << 26))  # 64 MiB default
    iters = int(os.environ.get("BENCH_ITERS", 3))

    impl = os.environ.get("BENCH_IMPL", "v3")  # v3 (tuned) | v2 | fast | plain

    import jax
    import jax.numpy as jnp

    from archon_tpu.core.bwt import bwt_forward, bwt_forward_fast
    from archon_tpu.core.fast2 import bwt_forward_v2, bwt_v3
    from archon_tpu.utils.corpus import load_or_synthesize

    name, data = load_or_synthesize(size)
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    fwd = {"v3": bwt_v3, "v2": bwt_forward_v2,
           "fast": bwt_forward_fast, "plain": bwt_forward}[impl]

    @jax.jit
    def step(x):
        out = fwd(x, "small")
        L, base = out[0], out[1]
        # tiny reduction so a scalar fetch forces the full computation
        # (block_until_ready is unreliable over the axon relay)
        return L, base, L.astype(jnp.int32).sum() + base

    # compile + warmup
    _, _, chk = step(arr)
    int(chk)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _, _, chk = step(arr)
        int(chk)  # scalar device->host fetch; forces completion
        times.append(time.perf_counter() - t0)

    best = min(times)
    mbps = size / 1e6 / best
    print(
        json.dumps(
            {
                "metric": f"forward_bwt_{name}_{size >> 20}MiB",
                "value": round(mbps, 2),
                "unit": "MB/s",
                "vs_baseline": round(mbps / BASELINE_MBPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
