"""Fields fast path: device spread kernels + host fold/unfold vs golden."""

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu.native import get_native
from fl_rl_compression_mpi_tpu.ops import fields, fl_numpy


def _check(data):
    bits_g, values_g = fl_numpy.encode(data)
    bits_f, values_f = fields.encode(data, bucket_frames=16)
    np.testing.assert_array_equal(bits_f, bits_g)
    np.testing.assert_array_equal(values_f, values_g)
    out = fields.decode(data.size, bits_g, values_g, bucket_frames=16)
    np.testing.assert_array_equal(out, data)


def test_fuzz_battery(fuzz_inputs):
    for data in fuzz_inputs:
        _check(data)


def test_sample_bmp(sample_bmp):
    _check(sample_bmp)


def test_fold_native_vs_numpy_fallback(monkeypatch):
    """Native fold/unfold and the NumPy fallback produce identical bytes."""
    if get_native() is None:
        pytest.skip("native toolchain unavailable")
    g = np.random.default_rng(0)
    data = g.integers(0, 64, 128 * 57 + 13, np.uint8)
    bits_g, values_g = fl_numpy.encode(data)
    f_native = fields.unfold(values_g, bits_g, data.size)

    monkeypatch.setattr("fl_rl_compression_mpi_tpu.ops.fields.get_native",
                        lambda: None)
    f_numpy = fields.unfold(values_g, bits_g, data.size)
    np.testing.assert_array_equal(f_native, f_numpy)

    v_numpy = fields.fold(f_numpy, bits_g, data.size)
    monkeypatch.undo()
    v_native = fields.fold(f_native, bits_g, data.size)
    np.testing.assert_array_equal(v_native, values_g)
    np.testing.assert_array_equal(v_numpy, values_g)


def test_spread_unspread_inverse():
    g = np.random.default_rng(1)
    data = g.integers(0, 256, 128 * 9 + 5, np.uint8)
    bits_g, _ = fl_numpy.encode(data)
    f = fields.spread_fields(data, bits_g)
    back = fields.unspread_fields(f, bits_g, data.size)
    np.testing.assert_array_equal(back, data)


@pytest.mark.parametrize("frame_length", [64, 256])
def test_other_frame_lengths(frame_length):
    g = np.random.default_rng(2)
    data = g.integers(0, 32, 3 * frame_length + 7, np.uint8)
    bits_g, values_g = fl_numpy.encode(data, frame_length)
    bits_f, values_f = fields.encode(data, frame_length, bucket_frames=4)
    np.testing.assert_array_equal(bits_f, bits_g)
    np.testing.assert_array_equal(values_f, values_g)
    out = fields.decode(data.size, bits_g, values_g, frame_length,
                        bucket_frames=4)
    np.testing.assert_array_equal(out, data)
