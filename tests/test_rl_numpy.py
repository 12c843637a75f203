"""Golden RL codec tests, from the spec's worked examples
(``/root/reference/IMPLEMENTATION-PLAN.md:87-89`` encode, ``:156-160``
decode) plus the 255-cap degenerate cases."""

import numpy as np

from fl_rl_compression_mpi_tpu.ops import rl_numpy


def test_worked_example_encode():
    data = np.array([5, 5, 8, 8, 8, 7, 7, 7, 7, 3, 4, 4, 4], np.uint8)
    counts, values = rl_numpy.encode(data)
    assert counts.tolist() == [2, 3, 4, 1, 3]
    assert values.tolist() == [5, 8, 7, 3, 4]


def test_worked_example_decode():
    counts = np.array([3, 2, 1, 2], np.uint8)
    values = np.array([8, 9, 2, 4], np.uint8)
    out = rl_numpy.decode(counts, values)
    assert out.tolist() == [8, 8, 8, 9, 9, 2, 4, 4]


def test_run_cap_255():
    for n, expect in [
        (255, [255]),
        (256, [255, 1]),
        (510, [255, 255]),
        (511, [255, 255, 1]),
        (1000, [255, 255, 255, 235]),
    ]:
        data = np.full(n, 9, np.uint8)
        counts, values = rl_numpy.encode(data)
        assert counts.tolist() == expect
        assert values.tolist() == [9] * len(expect)
        np.testing.assert_array_equal(rl_numpy.decode(counts, values), data)


def test_no_runs_worst_case():
    data = np.arange(256, dtype=np.uint8)
    counts, values = rl_numpy.encode(data)
    assert counts.size == 256 and (counts == 1).all()
    np.testing.assert_array_equal(values, data)


def test_vectorized_matches_sequential(fuzz_inputs):
    for data in fuzz_inputs:
        cs, vs = rl_numpy.encode_seq(data)
        cv, vv = rl_numpy.encode(data)
        np.testing.assert_array_equal(cs, cv)
        np.testing.assert_array_equal(vs, vv)
        np.testing.assert_array_equal(rl_numpy.decode(cv, vv), data)
        np.testing.assert_array_equal(rl_numpy.decode_seq(cs, vs), data)


def test_sample_bmp_roundtrip(sample_bmp):
    counts, values = rl_numpy.encode(sample_bmp)
    out = rl_numpy.decode(counts, values)
    np.testing.assert_array_equal(out, sample_bmp)
