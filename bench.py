"""Benchmark: forward BWT throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

vs_baseline is measured against the 500 MB/s/chip north-star target from
BASELINE.md (the reference publishes no absolute numbers).

Default path is the production block-streaming mode (BENCH_IMPL=blocks):
4 MiB blocks transformed in one fused batched jit — the same framing the
reference family ships (x1 hardcodes 4 MiB blocks, ArchonX1.c:19; x2/x3
take -b), and the mode `archon e` uses.  Whole-file single-block modes are
selectable via BENCH_IMPL=v3|v2|fast|plain; block size via BENCH_BLOCK.
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
    impl = os.environ.get("BENCH_IMPL", "blocks")
    block = int(os.environ.get("BENCH_BLOCK", 1 << 22))  # x1's 4 MiB

    import jax
    import jax.numpy as jnp

    from archon_tpu.utils.corpus import load_or_synthesize

    name, data = load_or_synthesize(size)

    if impl == "blocks":
        from archon_tpu.core.batched import bwt_batched_v3

        nblocks = max(1, size // block)
        block = min(block, size)
        size = nblocks * block  # throughput counts processed bytes only
        arr = jnp.asarray(
            np.frombuffer(data[:size], np.uint8).reshape(nblocks, block)
        )

        @jax.jit
        def step(x):
            L2, base2 = bwt_batched_v3(x, "small")
            return L2, base2, L2.astype(jnp.int32).sum() + base2.sum()

        metric = f"forward_bwt_blocks{block >> 20}MiB_{name}_{size >> 20}MiB"
    else:
        from archon_tpu.core.bwt import bwt_forward, bwt_forward_fast
        from archon_tpu.core.fast2 import bwt_forward_v2, bwt_v3

        fwd = {"v3": bwt_v3, "v2": bwt_forward_v2,
               "fast": bwt_forward_fast, "plain": bwt_forward}[impl]
        arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8))

        @jax.jit
        def step(x):
            out = fwd(x, "small")
            L, base = out[0], out[1]
            return L, base, L.astype(jnp.int32).sum() + base

        metric = f"forward_bwt_{name}_{size >> 20}MiB"

    # compile + warmup; scalar fetch forces completion (axon relay's
    # block_until_ready returns early)
    _, _, chk = step(arr)
    int(chk)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _, _, chk = step(arr)
        int(chk)
        times.append(time.perf_counter() - t0)

    best = min(times)
    mbps = size / 1e6 / best
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(mbps, 2),
                "unit": "MB/s",
                "vs_baseline": round(mbps / BASELINE_MBPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
