"""Benchmark: forward BWT throughput per chip (+ decode as a bonus field).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N, ...}

vs_baseline is measured against the 500 MB/s/chip north-star target from
BASELINE.md (the reference publishes no absolute numbers).

Two hard lessons from round 1 (BENCH_r01.json: rc=124, parsed=null) are
baked in:

1. **Hard deadline.**  A watchdog thread prints the best result measured so
   far and exits the process at BENCH_BUDGET seconds (default 450) no
   matter what the XLA/relay stack is doing.  A partial number always beats
   a timeout.
2. **Persistent compilation cache.**  On this relay a cold compile of the
   production program costs several *minutes*; the repo-local cache at
   .jax_cache/ (written on first successful run, hit on every later one)
   makes the driver's end-of-round run execute-only.  Keep the cache warm:
   any change to the measured program's HLO must be followed by one full
   bench.py run before the round ends.

Default path is the production block-streaming mode (BENCH_IMPL=blocks):
4 MiB blocks transformed in one fused batched jit — the same framing the
reference family ships (x1 hardcodes 4 MiB blocks, ArchonX1.c:19; x2/x3
take -b) and the mode `archon e` uses.  Whole-file single-block modes are
selectable via BENCH_IMPL=v3|v2|fast|plain; block size via BENCH_BLOCK.
"""

import json
import os
import sys
import threading
import time

import numpy as np

BASELINE_MBPS = 500.0
_REPO = os.path.dirname(os.path.abspath(__file__))

# state shared with the watchdog: "best" holds the most recent complete
# result dict; "printed" flips once the main path has emitted its line
_STATE = {"best": None, "printed": False}
_LOCK = threading.Lock()


def _emit(result: dict) -> None:
    with _LOCK:
        if _STATE["printed"]:
            return
        _STATE["printed"] = True
    print(json.dumps(result), flush=True)


def _watchdog(deadline: float) -> None:
    time.sleep(max(0.0, deadline - time.time()))
    with _LOCK:
        best = _STATE["best"]
        if _STATE["printed"]:
            return
        _STATE["printed"] = True
    if best is not None:
        print(json.dumps(best), flush=True)
        sys.stdout.flush()
        os._exit(0)
    os._exit(3)


def main():
    budget = float(os.environ.get("BENCH_BUDGET", 450))
    deadline = time.time() + budget
    threading.Thread(target=_watchdog, args=(deadline,), daemon=True).start()

    size = int(os.environ.get("BENCH_SIZE", 1 << 26))  # 64 MiB default
    iters = int(os.environ.get("BENCH_ITERS", 3))
    impl = os.environ.get("BENCH_IMPL", "blocks")
    block = int(os.environ.get("BENCH_BLOCK", 1 << 22))  # x1's 4 MiB

    # repo-local persistent compilation cache (must be set before the
    # backend initializes); see module docstring
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
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
    elif impl == "a6":
        # full a6 pipeline, byte config (uniform-width symbol fast path):
        # recode + suffix sort + payload emission (VERDICT r1 item 6)
        from archon_tpu.core.a6 import _a6_symbol_transform

        arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
        code_map = jnp.asarray(np.arange(256, dtype=np.uint8))

        @jax.jit
        def step(x):
            out, base = _a6_symbol_transform(x, code_map)
            return out, base, out.astype(jnp.int32).sum() + base

        metric = f"a6_byte_bwt_{name}_{size >> 20}MiB"
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
    t_c = time.time()
    L, base, chk = step(arr)
    int(chk)
    compile_s = round(time.time() - t_c, 1)

    times = []
    for _ in range(max(1, iters)):
        t0 = time.perf_counter()
        _, _, chk = step(arr)
        int(chk)
        times.append(time.perf_counter() - t0)
        mbps = size / 1e6 / min(times)
        with _LOCK:
            _STATE["best"] = {
                "metric": metric,
                "value": round(mbps, 2),
                "unit": "MB/s",
                "vs_baseline": round(mbps / BASELINE_MBPS, 4),
                "compile_s": compile_s,
                "iters": len(times),
            }
        if time.time() > deadline - 1.5 * times[-1]:
            break

    result = dict(_STATE["best"])

    # bonus metrics with leftover budget: host-native decode of the blocks
    # just produced (the reference ships decode timing too, a4/src/main.c:53)
    try:
        if impl == "blocks" and time.time() < deadline - 20:
            from archon_tpu import native

            if native.available():
                Lh = np.asarray(L)
                bh = np.asarray(base)
                t0 = time.perf_counter()
                for b in range(Lh.shape[0]):
                    native.unbwt(Lh[b], int(bh[b]), False)
                dt = time.perf_counter() - t0
                result["decode_native_mbps"] = round(size / 1e6 / dt, 2)
    except Exception:
        pass

    _emit(result)


if __name__ == "__main__":
    main()
