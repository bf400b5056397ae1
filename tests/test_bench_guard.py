"""bench.py warm-marker guard: per-file drift reporting (VERDICT r3 #8)."""

import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_program_hash_per_source_files():
    bench = _bench()
    files = bench._file_hashes(bench._BLOCKS_SOURCES)
    assert set(files) == set(bench._BLOCKS_SOURCES)
    assert bench.program_hash() == bench._combined(files)
    # a6 hash covers a superset of the blocks sources
    a6_files = bench._file_hashes(bench._A6_SOURCES)
    assert set(files) < set(a6_files)


def test_warn_stale_names_changed_files(capsys):
    bench = _bench()
    files = bench._file_hashes(bench._BLOCKS_SOURCES)
    stale = dict(files)
    stale["archon_tpu/core/fast2.py"] = "0" * 16
    bench.warn_stale(
        {"files": stale}, bench._BLOCKS_SOURCES, "blocks",
        "scripts/compile_blocks_tpu.py",
    )
    err = capsys.readouterr().err
    assert "STALE COMPILE CACHE" in err
    assert "archon_tpu/core/fast2.py" in err
    assert "archon_tpu/core/batched.py" not in err  # unchanged: not named
    assert "compile_blocks_tpu.py" in err


def test_warn_stale_without_file_map(capsys):
    bench = _bench()
    bench.warn_stale({}, bench._BLOCKS_SOURCES, "blocks", "x.py")
    err = capsys.readouterr().err
    assert "STALE COMPILE CACHE" in err
