"""Golden FL codec tests: sequential vs vectorized, round-trips, format laws.

Fixture values for the worked example come from the reference design doc
(``/root/reference/IMPLEMENTATION-PLAN.md:11-14``): with frame length 3,
input [0,2,1,5,5,7,10,1,13] → bits [2,3,4].
"""

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu.ops import fl_numpy


def test_worked_example_bits():
    data = np.array([0, 2, 1, 5, 5, 7, 10, 1, 13], np.uint8)
    bits, values = fl_numpy.encode_seq(data, frame_length=3)
    assert bits.tolist() == [2, 3, 4]
    # 2*3 + 3*3 + 4*3 = 27 bits -> 4 bytes
    assert values.size == 4
    out = fl_numpy.decode_seq(data.size, bits, values, frame_length=3)
    np.testing.assert_array_equal(out, data)


def test_worked_example_bitstream_exact():
    # Hand-packed, LSB-first within bytes: frame0 00,10,01 (w=2);
    # frame1 101,101,111 (w=3); frame2 1010,0001,1101 (w=4).
    data = np.array([0, 2, 1, 5, 5, 7, 10, 1, 13], np.uint8)
    stream_bits = []
    for v, b in [(0, 2), (2, 2), (1, 2), (5, 3), (5, 3), (7, 3),
                 (10, 4), (1, 4), (13, 4)]:
        stream_bits += [(v >> k) & 1 for k in range(b)]
    expect = np.zeros(4, np.uint8)
    for p, bit in enumerate(stream_bits):
        expect[p // 8] |= bit << (p % 8)
    _, values = fl_numpy.encode_seq(data, frame_length=3)
    np.testing.assert_array_equal(values, expect)


def test_vectorized_matches_sequential(fuzz_inputs):
    for data in fuzz_inputs:
        bs, vs = fl_numpy.encode_seq(data)
        bv, vv = fl_numpy.encode(data)
        np.testing.assert_array_equal(bs, bv)
        np.testing.assert_array_equal(vs, vv)
        if data.size:
            out = fl_numpy.decode(data.size, bv, vv)
            np.testing.assert_array_equal(out, data)
            out_seq = fl_numpy.decode_seq(data.size, bs, vs)
            np.testing.assert_array_equal(out_seq, data)


def test_all_widths_roundtrip():
    # Force every width 1..8 to appear, with tails of every phase.
    g = np.random.default_rng(7)
    for b in range(1, 9):
        for n in (128, 128 * 3, 128 * 2 + 1, 128 * 2 + 17, 128 * 2 + 127):
            hi = (1 << b) - 1
            data = g.integers(0, hi + 1, n).astype(np.uint8)
            data[0] = hi  # pin the width
            bits, values = fl_numpy.encode(data)
            assert int(bits.max()) == b
            np.testing.assert_array_equal(
                fl_numpy.decode(n, bits, values), data)
            bs, vs = fl_numpy.encode_seq(data)
            np.testing.assert_array_equal(bits, bs)
            np.testing.assert_array_equal(values, vs)


def test_size_formula():
    # valuesSize == ceil(sum_f bits_f * count_f / 8)  (fl_cpu.cu:49-53)
    g = np.random.default_rng(3)
    data = g.integers(0, 64, 128 * 5 + 77).astype(np.uint8)
    bits, values = fl_numpy.encode(data)
    counts = np.full(bits.size, 128, np.int64)
    counts[-1] = data.size - 128 * (bits.size - 1)
    total_bits = int((bits.astype(np.int64) * counts).sum())
    assert values.size == (total_bits + 7) // 8
    assert fl_numpy.compressed_size(data) == bits.size + values.size


def test_zero_frames_floor_one_bit():
    data = np.zeros(256, np.uint8)
    bits, values = fl_numpy.encode(data)
    assert bits.tolist() == [1, 1]
    assert values.size == 32  # 256 bits / 8
    assert not values.any()
    np.testing.assert_array_equal(fl_numpy.decode(256, bits, values), data)


def test_sample_bmp_roundtrip(sample_bmp):
    bits, values = fl_numpy.encode(sample_bmp)
    assert bits.size == (sample_bmp.size + 127) // 128
    out = fl_numpy.decode(sample_bmp.size, bits, values)
    np.testing.assert_array_equal(out, sample_bmp)
    # BMP is 24-bit natural imagery: FL should compress it.
    assert bits.size + values.size < sample_bmp.size


def test_split_invariance(sample_bmp):
    """FL output is invariant to splitting at 128-byte-aligned boundaries —
    the invariant that makes the distributed merge a byte concat
    (SURVEY.md finding #3)."""
    data = sample_bmp[: 128 * 1000 + 57]
    whole_bits, whole_values = fl_numpy.encode(data)
    for nshards in (2, 3, 5):
        chunk = (data.size // (128 * nshards)) * 128
        parts = [data[i * chunk: (i + 1) * chunk] for i in range(nshards - 1)]
        parts.append(data[(nshards - 1) * chunk:])
        bs, vs = zip(*(fl_numpy.encode(p) for p in parts))
        np.testing.assert_array_equal(np.concatenate(bs), whole_bits)
        np.testing.assert_array_equal(np.concatenate(vs), whole_values)


def test_decode_validates_frame_count():
    data = np.arange(200, dtype=np.uint8)
    bits, values = fl_numpy.encode(data)
    with pytest.raises(ValueError):
        fl_numpy.decode(1000, bits, values)
