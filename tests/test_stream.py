"""Streaming (chunked) FL compression — byte-identical to whole-file."""

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu import container, stream
from fl_rl_compression_mpi_tpu.cli import main
from fl_rl_compression_mpi_tpu.ops import fl_numpy


@pytest.mark.parametrize("size", [128 * 100, 128 * 257 + 55, 1000])
def test_stream_matches_whole_file(tmp_path, size):
    data = np.random.default_rng(size).integers(0, 64, size, np.uint8)
    src = str(tmp_path / "in.bin")
    data.tofile(src)
    whole = str(tmp_path / "whole.fl")
    bits, values = fl_numpy.encode(data)
    container.save_fl(whole, container.FLCompressed(bits, values, data.size))

    out = str(tmp_path / "stream.fl")
    stream.compress_fl_stream(src, out, chunk_mb=1)  # forces many chunks? 1MB
    assert open(out, "rb").read() == open(whole, "rb").read()

    back = str(tmp_path / "back.bin")
    stream.decompress_fl_stream(out, back, chunk_mb=1)
    np.testing.assert_array_equal(np.fromfile(back, np.uint8), data)


def test_stream_tiny_chunks(tmp_path):
    """Chunk smaller than default floors to one frame and still matches."""
    data = np.random.default_rng(1).integers(0, 256, 128 * 33 + 5, np.uint8)
    src = str(tmp_path / "in.bin")
    data.tofile(src)
    out = str(tmp_path / "s.fl")
    # chunk_mb=0 floors to one frame per chunk
    stream.compress_fl_stream(src, out, chunk_mb=0)
    comp = container.load_fl(out)
    bits_g, values_g = fl_numpy.encode(data)
    np.testing.assert_array_equal(comp.bits, bits_g)
    np.testing.assert_array_equal(comp.values, values_g)
    back = str(tmp_path / "b.bin")
    stream.decompress_fl_stream(out, back, chunk_mb=0)
    np.testing.assert_array_equal(np.fromfile(back, np.uint8), data)


def test_stream_empty(tmp_path):
    src = str(tmp_path / "e.bin")
    open(src, "wb").close()
    out = str(tmp_path / "e.fl")
    stream.compress_fl_stream(src, out)
    assert open(out, "rb").read() == b"\x00" * 24
    back = str(tmp_path / "e2.bin")
    stream.decompress_fl_stream(out, back)
    assert open(back, "rb").read() == b""


def test_stream_cli(tmp_path):
    data = np.random.default_rng(2).integers(0, 32, 300_000, np.uint8)
    src = str(tmp_path / "in.bin")
    data.tofile(src)
    comp = str(tmp_path / "o.fl")
    back = str(tmp_path / "o.bin")
    assert main(["c", "fl", src, comp, "--stream-chunk-mb", "1"]) == 0
    assert main(["d", "fl", comp, back, "--stream-chunk-mb", "1"]) == 0
    np.testing.assert_array_equal(np.fromfile(back, np.uint8), data)
    # containers interoperate with non-streaming methods
    back2 = str(tmp_path / "o2.bin")
    assert main(["d", "fl-cpu", comp, back2]) == 0
    np.testing.assert_array_equal(np.fromfile(back2, np.uint8), data)


def test_stream_rejects_rl(tmp_path, capsys):
    src = str(tmp_path / "x.bin")
    np.zeros(10, np.uint8).tofile(src)
    assert main(["c", "rl", src, str(tmp_path / "x.rl"),
                 "--stream-chunk-mb", "1"]) == 2


def test_stream_cli_verify(tmp_path, capsys):
    data = np.random.default_rng(3).integers(0, 32, 300_000, np.uint8)
    src = str(tmp_path / "in.bin")
    data.tofile(src)
    comp = str(tmp_path / "o.fl")
    assert main(["c", "fl", src, comp, "--stream-chunk-mb", "1",
                 "--verify"]) == 0
    assert "verification OK" in capsys.readouterr().err
    # corrupting the container makes --verify fail with a tagged error
    blob = bytearray(open(comp, "rb").read())
    blob[-1] ^= 0xFF
    bad_src = str(tmp_path / "in2.bin")
    data.tofile(bad_src)
    open(comp, "wb").write(bytes(blob))
    from fl_rl_compression_mpi_tpu import stream
    assert not stream.verify_fl_stream(bad_src, comp, 128, 1)
