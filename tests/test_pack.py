"""Compressing container (ATA2) and its entropy back end (entropy/pack.py):
MTF + RLE0 + exact-Huffman per block — the bzip-class stage the reference
names as its ratio goal (/root/reference/README.md:17) but never ships."""

import pathlib
import subprocess

import numpy as np
import pytest

from archon_tpu.entropy.pack import pack_block, unpack_block
from archon_tpu.io import blocks
from archon_tpu.utils.corpus import markup_like, text_like


def test_pack_block_fuzz_roundtrip():
    rng = np.random.default_rng(3)
    cases = [
        np.zeros(0, np.uint8),
        np.zeros(1, np.uint8),
        np.full(70000, 9, np.uint8),
        rng.integers(0, 256, 40000).astype(np.uint8),   # incompressible
        rng.integers(0, 2, 100000).astype(np.uint8),
        np.frombuffer(text_like(50000), np.uint8),
    ]
    for i in range(6):
        hi = int(rng.integers(2, 257))
        cases.append(rng.integers(0, hi, int(rng.integers(1, 30000))).astype(np.uint8))
    for i, L in enumerate(cases):
        out = unpack_block(pack_block(L), len(L))
        assert (out == L).all(), i


def test_pack_python_fallback_parity():
    from archon_tpu.native import (
        _bitpack16_py,
        _bitunpack16_py,
        _mtf_rle0_py,
        _unrle0_unmtf_py,
    )
    from archon_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    L = np.frombuffer(text_like(4000, seed=2), np.uint8)
    sy = native.mtf_rle0(L)
    assert (sy == _mtf_rle0_py(L)).all()
    assert (_unrle0_unmtf_py(sy, len(L)) == L).all()
    hist = np.bincount(sy, minlength=257)
    present = np.nonzero(hist)[0]
    from archon_tpu.entropy.pack import _codes_for

    vals, lens, _ = _codes_for(present, hist[present])
    wn, tn = native.bitpack16(sy, vals, lens)
    wp, tp = _bitpack16_py(sy, vals, lens)
    assert tn == tp and (wn[: (tn + 31) // 32] == wp[: (tp + 31) // 32]).all()
    assert (_bitunpack16_py(wn, tn, vals, lens, len(sy)) == sy).all()


def test_packed_container_roundtrip_and_ratio():
    data = markup_like(400_000, seed=4)
    blob = blocks.encode_file(data, "a4", block_size=1 << 16, pack=True)
    assert blob[:4] == b"ATA2"
    assert blocks.decode_file(blob) == data
    # the point of the format: real compression on markup text
    assert len(blob) < 0.45 * len(data)
    # unpacked container unchanged
    plain = blocks.encode_file(data, "a4", block_size=1 << 16)
    assert plain[:4] == b"ATA1"
    assert len(plain) > len(data)


def test_packed_container_fault_isolation():
    data = text_like(3 * 1024, seed=6)
    blob = bytearray(blocks.encode_file(data, "a4", block_size=1024, pack=True))
    # corrupt the middle frame's payload
    import struct

    pos = 12
    n0, p0 = struct.unpack("<II", blob[pos : pos + 8])
    pos += 12 + p0
    n1, p1 = struct.unpack("<II", blob[pos : pos + 8])
    blob[pos + 8 + p1 // 2] ^= 0xFF
    errors = []
    out = blocks.decode_file(bytes(blob), strict=False,
                             on_error=lambda i, e: errors.append(i))
    assert errors == [1]
    assert out[:1024] == data[:1024]
    assert out[2048:] == data[2048:]


def test_packed_extract_block_reference_decodable(oracles):
    if "a4" not in oracles:
        pytest.skip("a4 oracle unavailable")
    data = text_like(40_000, seed=8)
    blob = blocks.encode_file(data, "a4", block_size=1 << 14, pack=True)
    b1 = blocks.extract_block(blob, 1)
    tmp = pathlib.Path("/tmp/archon_test_pack_b1")
    tmp.write_bytes(b1)
    rt = pathlib.Path("/tmp/archon_test_pack_b1rt")
    subprocess.run([oracles["a4"], "d", str(tmp), str(rt)], check=True,
                   capture_output=True, timeout=60)
    assert rt.read_bytes() == data[1 << 14 : 2 << 14]


def test_packed_resume(tmp_path):
    data = text_like(5000, seed=10)
    out = tmp_path / "o.at2"
    blocks.encode_to_path(data, out, block_size=1024, pack=True)
    full = out.read_bytes()
    assert blocks.decode_file(full) == data
    out.write_bytes(full[:-30])
    n = blocks.encode_to_path(data, out, block_size=1024, resume=True, pack=True)
    assert n == 1 and out.read_bytes() == full
    # container-kind switch restarts cleanly
    n = blocks.encode_to_path(data, out, block_size=1024, resume=True)
    assert n == 5 and blocks.decode_file(out.read_bytes()) == data
