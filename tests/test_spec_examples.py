"""The reference design doc's worked examples as literal fixtures.

``/root/reference/IMPLEMENTATION-PLAN.md`` contains hand-computed examples
(the only 'test vectors' the reference ever had); every backend must
reproduce them exactly.  Citations are into that document.
"""

import numpy as np

from fl_rl_compression_mpi_tpu.ops import fl_numpy, rl_jax, rl_numpy
from fl_rl_compression_mpi_tpu.native import get_native


def test_fl_worked_example():
    """IMPLEMENTATION-PLAN.md:11-13 — frame length 3:
    input [0,2,1,5,5,7,10,1,13] → bits [2,3,4], stream
    00_10_01 | 101_101_111 | 1010_0001_1101 (LSB-first in our container).
    """
    data = np.array([0, 2, 1, 5, 5, 7, 10, 1, 13], np.uint8)
    # frame length must be a multiple of 8 in this framework's container
    # (byte-alignment invariant), so verify the widths and per-frame packs
    # through the sequential oracle at frame_length=3 semantics:
    bits, values = fl_numpy.encode_seq(data, frame_length=3)
    np.testing.assert_array_equal(bits, [2, 3, 4])
    # stream bits LSB-first: elements at widths [2,2,2, 3,3,3, 4,4,4]
    stream = []
    for v, b in zip(data, np.repeat(bits, 3)):
        stream.extend((int(v) >> k) & 1 for k in range(b))
    want = np.zeros((len(stream) + 7) // 8, np.uint8)
    for p, bit in enumerate(stream):
        want[p // 8] |= bit << (p % 8)
    np.testing.assert_array_equal(values, want)
    np.testing.assert_array_equal(
        fl_numpy.decode_seq(data.size, bits, values, frame_length=3), data)


def test_fl_frame_start_indices_example():
    """IMPLEMENTATION-PLAN.md:24 — frameStartIndices = [0, 6, 15] bits."""
    bits = np.array([2, 3, 4], np.int64)
    starts = np.concatenate([[0], np.cumsum(bits * 3)[:-1]])
    np.testing.assert_array_equal(starts, [0, 6, 15])


def test_rl_encode_worked_example():
    """IMPLEMENTATION-PLAN.md:87-89 — input
    [5,5,8,8,8,7,7,7,7,3,4,4,4] → counts [2,3,4,1,3], values [5,8,7,3,4].
    """
    data = np.array([5, 5, 8, 8, 8, 7, 7, 7, 7, 3, 4, 4, 4], np.uint8)
    for enc in (rl_numpy.encode_seq, rl_numpy.encode,
                lambda d: rl_jax.encode(d, bucket=64)):
        counts, values = enc(data)
        np.testing.assert_array_equal(counts, [2, 3, 4, 1, 3])
        np.testing.assert_array_equal(values, [5, 8, 7, 3, 4])
    nat = get_native()
    if nat is not None:
        counts, values = nat.rl_encode(data)
        np.testing.assert_array_equal(counts, [2, 3, 4, 1, 3])
        np.testing.assert_array_equal(values, [5, 8, 7, 3, 4])


def test_rl_start_mask_example():
    """IMPLEMENTATION-PLAN.md:93-97 — startMask of the example input."""
    data = np.array([5, 5, 8, 8, 8, 7, 7, 7, 7, 3, 4, 4, 4], np.uint8)
    mask = np.ones(data.size, bool)
    mask[1:] = data[1:] != data[:-1]
    np.testing.assert_array_equal(
        mask.astype(int), [1, 0, 1, 0, 0, 1, 0, 0, 0, 1, 1, 0, 0])


def test_rl_decode_worked_example():
    """IMPLEMENTATION-PLAN.md:156-158 — counts [3,2,1,2], values [8,9,2,4]
    → output [8,8,8,9,9,2,4,4]."""
    counts = np.array([3, 2, 1, 2], np.uint8)
    values = np.array([8, 9, 2, 4], np.uint8)
    want = np.array([8, 8, 8, 9, 9, 2, 4, 4], np.uint8)
    np.testing.assert_array_equal(rl_numpy.decode_seq(counts, values), want)
    np.testing.assert_array_equal(rl_numpy.decode(counts, values), want)
    np.testing.assert_array_equal(
        rl_jax.decode(counts, values, bucket=64), want)
    nat = get_native()
    if nat is not None:
        np.testing.assert_array_equal(nat.rl_decode(counts, values), want)


def test_rl_256_cap_split():
    """IMPLEMENTATION-PLAN.md:125 — 256 equal symbols → [255, 1] pieces."""
    data = np.full(256, 9, np.uint8)
    counts, values = rl_numpy.encode(data)
    np.testing.assert_array_equal(counts, [255, 1])
    np.testing.assert_array_equal(values, [9, 9])
