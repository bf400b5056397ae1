"""Compile + time the a6 device programs on the TPU relay and write the
bench a6 marker (VERDICT r3 #4: put a6 on the device scoreboard).

Programs warmed (the exact cache entries bench.py's a6 stage executes):
  - byte config, symbol fast path (core.a6._a6_symbol_transform) at 16 MiB
  - var (Huffman) config, bit-domain path (core.a6._a6_transform) at 4 MiB,
    with max_len taken from the real Huffman table of the bench corpus
    prefix (text_like is prefix-stable, so bench reproduces the same table)

Usage: python scripts/warm_a6.py [byte_log var_log]   (defaults 24 22)
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    blog = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    vlog = int(sys.argv[2]) if len(sys.argv) > 2 else 22

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import numpy as np

    import bench as bench_mod
    from archon_tpu.core.a6 import (
        _a6_symbol_transform,
        _a6_transform,
        _code_arrays,
        build_codes,
    )
    from archon_tpu.utils.corpus import load_or_synthesize

    _, data = load_or_synthesize(max(1 << blog, 1 << vlog))

    def timed(label, step, arr, size):
        t0 = time.time()
        out = step(arr)
        float(out[-1])
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = step(arr)
            float(out[-1])
            times.append(time.perf_counter() - t0)
        mbps = size / 1e6 / min(times)
        print(
            f"[warm_a6] {label}: compile {compile_s:.0f}s, best "
            f"{min(times)*1e3:.0f} ms = {mbps:.1f} MB/s", flush=True,
        )
        return mbps, compile_s

    bsize = 1 << blog
    arr = jnp.asarray(np.frombuffer(data[:bsize], np.uint8))
    code_map = jnp.asarray(np.arange(256, dtype=np.uint8))
    byte_mbps, byte_c = timed(
        f"byte {bsize >> 20}MiB",
        lambda x: _a6_symbol_transform(x, code_map), arr, bsize,
    )

    vsize = 1 << vlog
    npdata = np.frombuffer(data[:vsize], np.uint8)
    codes = build_codes(npdata, "var")
    freq = np.bincount(npdata, minlength=256)
    max_len = int(max(codes[i].length for i in range(256) if freq[i]))
    vals, lens = _code_arrays(codes)
    arrv = jnp.asarray(npdata)
    var_mbps, var_c = timed(
        f"var {vsize >> 20}MiB (max_len={max_len})",
        lambda x: _a6_transform(x, vals, lens, max_len=max_len), arrv, vsize,
    )

    marker = os.path.join(_REPO, ".jax_cache", "a6_warm.marker")
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as fh:
        json.dump(
            {
                "hash": bench_mod.program_hash(bench_mod._A6_SOURCES),
                "files": bench_mod._file_hashes(bench_mod._A6_SOURCES),
                "byte_size": bsize,
                "var_size": vsize,
                "byte_mbps": round(byte_mbps, 2),
                "var_mbps": round(var_mbps, 2),
                "compile_s": round(byte_c + var_c, 1),
            },
            fh,
        )
    print(f"[warm_a6] marker written: {marker}", flush=True)


if __name__ == "__main__":
    main()
