"""Corrupt/truncated container handling (reference component #13's error
model: tagged errors, no crashes — ``utils.cuh:6-28``, ``main.cu:95-99``)."""

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu import container
from fl_rl_compression_mpi_tpu.cli import main
from fl_rl_compression_mpi_tpu.native import get_native
from fl_rl_compression_mpi_tpu.ops import fl_numpy


@pytest.fixture
def fl_file(tmp_path):
    g = np.random.default_rng(0)
    data = g.integers(0, 16, 10_000, np.uint8)
    bits, values = fl_numpy.encode(data)
    p = str(tmp_path / "x.fl")
    container.save_fl(p, container.FLCompressed(bits, values, data.size))
    return p, data


def test_truncated_header(tmp_path):
    p = str(tmp_path / "t.fl")
    with open(p, "wb") as f:
        f.write(b"\x01\x02\x03")
    with pytest.raises(IOError):
        container.load_fl(p)


def test_truncated_payload(fl_file, tmp_path):
    p, _ = fl_file
    blob = open(p, "rb").read()
    q = str(tmp_path / "trunc.fl")
    with open(q, "wb") as f:
        f.write(blob[:-10])
    with pytest.raises(IOError):
        container.load_fl(q)


def test_cli_reports_error_not_crash(fl_file, tmp_path, capsys):
    p, _ = fl_file
    blob = open(p, "rb").read()
    q = str(tmp_path / "trunc.fl")
    with open(q, "wb") as f:
        f.write(blob[:-10])
    rc = main(["d", "fl-cpu", q, str(tmp_path / "out.bin")])
    assert rc == 1
    assert "[ERROR]" in capsys.readouterr().err


def test_native_unfold_rejects_short_stream(fl_file):
    nat = get_native()
    if nat is None:
        pytest.skip("native unavailable")
    p, data = fl_file
    comp = container.load_fl(p)
    with pytest.raises(ValueError):
        nat.fl_unfold(comp.values[:-5], comp.bits, int(comp.input_size))


def test_native_unfold_rejects_oversized_input_claim(fl_file):
    """A header claiming an inputSize far beyond the bits array must raise,
    not read out of bounds (round-1 advisor finding: 8 GB claim over a
    10-byte bits array segfaulted)."""
    nat = get_native()
    if nat is None:
        pytest.skip("native unavailable")
    p, _ = fl_file
    comp = container.load_fl(p)
    with pytest.raises(ValueError):
        nat.fl_unfold(comp.values, comp.bits, 8 << 30)


def test_cli_oversized_input_claim_tagged_error(fl_file, tmp_path, capsys):
    p, _ = fl_file
    comp = container.load_fl(p)
    q = str(tmp_path / "huge.fl")
    container.save_fl(q, container.FLCompressed(
        comp.bits[:10], comp.values, 8 << 30))
    rc = main(["d", "fl", q, str(tmp_path / "out.bin")])
    assert rc == 1
    assert "[ERROR]" in capsys.readouterr().err


def test_native_unfold_rejects_bad_width_byte(fl_file):
    nat = get_native()
    if nat is None:
        pytest.skip("native unavailable")
    p, _ = fl_file
    comp = container.load_fl(p)
    bad = comp.bits.copy()
    bad[0] = 200   # width must be 1..8; 4*200 would be a UB shift
    with pytest.raises(ValueError):
        nat.fl_unfold(comp.values, bad, int(comp.input_size))


def test_native_rl_decode_rejects_length_mismatch():
    nat = get_native()
    if nat is None:
        pytest.skip("native unavailable")
    with pytest.raises(ValueError):
        nat.rl_decode(np.full(10, 5, np.uint8), np.full(4, 7, np.uint8))


def test_load_rl_rejects_size_mismatch(tmp_path):
    from fl_rl_compression_mpi_tpu.container import _HEADER
    p = str(tmp_path / "bad.rl")
    with open(p, "wb") as f:
        f.write(_HEADER.pack(100, 10, 4))
        f.write(b"\x05" * 10 + b"\x07" * 4)
    with pytest.raises(IOError):
        container.load_rl(p)


def test_empty_container_roundtrip(tmp_path):
    p = str(tmp_path / "e.fl")
    container.save_fl(p, container.FLCompressed(
        np.zeros(0, np.uint8), np.zeros(0, np.uint8), 0))
    assert open(p, "rb").read() == b"\x00" * 24
    c = container.load_fl(p)
    assert c.input_size == 0 and c.bits.size == 0


def test_stream_decode_rejects_short_widths(fl_file, tmp_path):
    """The streaming decoder must reject a widths array shorter than the
    claimed frame count up front — without the check its chunk loop runs
    out of frames, decodes nothing, and silently truncates the output."""
    from fl_rl_compression_mpi_tpu import stream
    p, _ = fl_file
    comp = container.load_fl(p)
    q = str(tmp_path / "short.fl")
    container.save_fl(q, container.FLCompressed(
        comp.bits[:10], comp.values, comp.input_size))
    with pytest.raises(IOError):
        stream.decompress_fl_stream(q, str(tmp_path / "out.bin"),
                                    chunk_mb=1)


def test_native_decode_rejects_empty_payload_nonzero_claim():
    nat = get_native()
    if nat is None:
        pytest.skip("native unavailable")
    with pytest.raises(ValueError):
        nat.fl_decode(1000, np.zeros(0, np.uint8), np.zeros(0, np.uint8))
