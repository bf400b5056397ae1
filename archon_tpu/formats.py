"""Archon file formats on the JAX core (host glue).

Both the a4 and a7 formats are: N bytes of BWT payload followed by a u32-LE
base index (a4/src/archon.c:227-234; a7/src/archon.cpp:887-900).  The payload
is the BWT of the *reversed* input; a4 uses the terminator-smallest suffix
order, a7 terminator-largest (see archon_tpu/golden/sa.py for the derivation
and oracle validation).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .core.unbwt import bwt_inverse
from .core.doubling import SENT_LARGE, SENT_SMALL

_CONVENTION = {"a4": SENT_SMALL, "a7": SENT_LARGE}


def encode(data: bytes, generation: str = "a4", verify: bool = True) -> bytes:
    """Transform ``data`` into an a4/a7-format blob, byte-exact with the
    reference binaries (where those are themselves correct).

    Runs the measurement-tuned v3 sorter (core/batched.bwt_batched_v3 on a
    single row); ``verify=True`` (default) uses the certified variant whose
    LF certificate stays compiled in, matching the reference's always-on
    VERIFY discipline (a4/src/main.c:7, a6/src/bwt.c:19-23)."""
    sentinel = _CONVENTION[generation]
    arr = jnp.asarray(np.frombuffer(data[::-1], dtype=np.uint8)).reshape(1, -1)
    if arr.shape[1] == 0:
        return np.uint32(0).tobytes()
    if verify:
        from .core.batched import bwt_batched_v3_certified

        L, base, ok = bwt_batched_v3_certified(arr, sentinel)
        if not bool(ok[0]):
            raise AssertionError("BWT verification failed (internal error)")
    else:
        from .core.batched import bwt_batched_v3

        L, base = bwt_batched_v3(arr, sentinel)
    return np.asarray(L[0]).tobytes() + np.uint32(int(base[0])).tobytes()


def decode(blob: bytes, generation: str = "a4", device: bool = False) -> bytes:
    """Invert an a4/a7-format blob back to the original bytes.

    Host path (default): the native C++ LF chain walk — for a serial decode
    the cache-bound walk beats the device's n-log-n pointer-doubling gathers.
    ``device=True`` forces the JAX path (used when the payload already lives
    on device inside a pipeline)."""
    sentinel = _CONVENTION[generation]
    n = len(blob) - 4
    if n < 0:
        raise ValueError("blob too short")
    if n == 0:
        return b""
    Lh = np.frombuffer(blob[:n], dtype=np.uint8)
    base = int(np.frombuffer(blob[n:], dtype=np.uint32)[0])
    if not device:
        from . import native

        if native.available():
            return native.unbwt(Lh, base, sentinel == SENT_LARGE).tobytes()
    out = bwt_inverse(jnp.asarray(Lh), jnp.int32(base), sentinel)
    return np.asarray(out).tobytes()
