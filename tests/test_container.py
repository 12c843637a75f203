"""Container format tests: byte-exact layout vs the reference's
``saveCompressedFL`` (``/root/reference/src/file_io.cu:222-280``)."""

import struct

import numpy as np

from fl_rl_compression_mpi_tpu import container
from fl_rl_compression_mpi_tpu.ops import fl_numpy, rl_numpy


def test_fl_layout_bytes(tmp_path):
    bits = np.array([2, 3, 4], np.uint8)
    values = np.array([0x10, 0x20, 0x30, 0x40], np.uint8)
    p = str(tmp_path / "x.fl")
    container.save_fl(p, container.FLCompressed(bits, values, input_size=9))
    raw = open(p, "rb").read()
    assert raw[:24] == struct.pack("<QQQ", 9, 3, 4)
    assert raw[24:27] == bytes([2, 3, 4])
    assert raw[27:] == bytes([0x10, 0x20, 0x30, 0x40])
    back = container.load_fl(p)
    assert back.input_size == 9
    np.testing.assert_array_equal(back.bits, bits)
    np.testing.assert_array_equal(back.values, values)


def test_fl_empty_container(tmp_path):
    # Empty input -> 24 zero bytes (reference returns empty FLCompressed,
    # fl_cpu.cu:11-14, and writes just the header).
    p = str(tmp_path / "e.fl")
    container.save_fl(p, container.FLCompressed(
        np.zeros(0, np.uint8), np.zeros(0, np.uint8), 0))
    assert open(p, "rb").read() == b"\0" * 24
    back = container.load_fl(p)
    assert back.input_size == 0 and back.bits.size == 0


def test_fl_file_roundtrip(tmp_path, sample_bmp):
    data = sample_bmp[: 128 * 300 + 5]
    bits, values = fl_numpy.encode(data)
    p = str(tmp_path / "s.fl")
    container.save_fl(p, container.FLCompressed(bits, values, data.size))
    back = container.load_fl(p)
    out = fl_numpy.decode(back.input_size, back.bits, back.values)
    np.testing.assert_array_equal(out, data)


def test_rl_file_roundtrip(tmp_path):
    data = np.repeat(np.arange(40, dtype=np.uint8), 300)
    counts, values = rl_numpy.encode(data)
    p = str(tmp_path / "s.rl")
    container.save_rl(p, container.RLCompressed(counts, values, data.size))
    back = container.load_rl(p)
    assert back.input_size == data.size
    np.testing.assert_array_equal(rl_numpy.decode(back.counts, back.values),
                                  data)


def test_merge_matches_whole(sample_bmp):
    data = sample_bmp[: 128 * 64 + 9]
    cut = 128 * 40
    a_bits, a_vals = fl_numpy.encode(data[:cut])
    b_bits, b_vals = fl_numpy.encode(data[cut:])
    merged = container.FLCompressed(a_bits, a_vals, cut).merge(
        container.FLCompressed(b_bits, b_vals, data.size - cut))
    w_bits, w_vals = fl_numpy.encode(data)
    assert merged.input_size == data.size
    np.testing.assert_array_equal(merged.bits, w_bits)
    np.testing.assert_array_equal(merged.values, w_vals)
