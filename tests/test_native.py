"""Native IO runtime tests: C++ table parser parity with numpy, async
writer completeness (SURVEY.md C14/C15 native analog)."""
import os

import numpy as np
import pytest

from base_tpu.io import native


@pytest.fixture(scope="module")
def table_file(tmp_path_factory, rng):
    p = tmp_path_factory.mktemp("native") / "table.txt"
    with open(p, "w") as f:
        f.write("# a comment line\n")
        f.write("colA colB colC colD\n")
        np.savetxt(f, rng.normal(size=(2000, 4)))
    return str(p)


def test_native_builds():
    assert native.native_available(), "g++ toolchain present; lib must build"


def test_parse_table_matches_numpy(table_file):
    got, header = native.parse_table(table_file)
    ref = np.loadtxt(table_file, skiprows=2)
    assert header == "colA colB colC colD"
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_parse_table_python_fallback(table_file):
    got, header = native._parse_table_py(table_file)
    ref = np.loadtxt(table_file, skiprows=2)
    assert header == "colA colB colC colD"
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_parse_table_rejects_ragged(tmp_path):
    p = tmp_path / "ragged.txt"
    p.write_text("1 2 3\n4 5\n")
    with pytest.raises(ValueError):
        native.parse_table(str(p))


def test_async_writer_complete_and_ordered(tmp_path):
    p = str(tmp_path / "w.txt")
    with native.AsyncWriter(p) as w:
        for i in range(5000):
            w.write(f"row {i}\n")
    lines = open(p).read().splitlines()
    assert len(lines) == 5000
    assert lines[0] == "row 0" and lines[-1] == "row 4999"


def test_async_writer_append_mode(tmp_path):
    p = str(tmp_path / "a.txt")
    with native.AsyncWriter(p) as w:
        w.write("first\n")
    with native.AsyncWriter(p, append=True) as w:
        w.write("second\n")
    assert open(p).read().splitlines() == ["first", "second"]
