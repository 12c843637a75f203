"""Production pack-2 fields path: speculative encode, exact-dispatch
decode, native fold_p2/unfold_p2 vs the NumPy fallbacks.

The TPU backend gate is monkeypatched so the Pallas kernels run in
interpret mode on CPU (the dense path stays off — its gate checks the
backend directly).
"""

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu.native import get_native
from fl_rl_compression_mpi_tpu.ops import fields, fl_jax, fl_numpy, fl_pallas

TR = fl_pallas.PACK_TILE_R


@pytest.fixture
def pallas_on(monkeypatch):
    monkeypatch.setattr(
        fl_jax, "_use_pallas",
        lambda fl, nw: (fl_pallas._supported(fl)
                        and nw % fl_pallas.TILE_WORDS == 0
                        and nw % (TR * 128) == 0))


@pytest.mark.parametrize("seed,size,hi", [
    (0, 300_000, 16),              # all widths <= 4: speculation hits
    (1, 128 * 500 + 17, 5),        # tail frame
    (2, 64, 2),
])
def test_encode_hit_matches_golden(pallas_on, seed, size, hi):
    data = np.random.default_rng(seed).integers(0, hi, size, np.uint8)
    bits, values = fl_jax.encode(data)
    bg, vg = fl_numpy.encode(data)
    np.testing.assert_array_equal(bits, bg)
    np.testing.assert_array_equal(values, vg)
    np.testing.assert_array_equal(fl_jax.decode(data.size, bits, values),
                                  data)


def test_encode_miss_falls_back(pallas_on):
    data = np.random.default_rng(3).integers(0, 256, 200_000, np.uint8)
    data[131_072] = 255            # guarantee a wide frame
    bits, values = fl_jax.encode(data)
    bg, vg = fl_numpy.encode(data)
    np.testing.assert_array_equal(bits, bg)
    np.testing.assert_array_equal(values, vg)
    np.testing.assert_array_equal(fl_jax.decode(data.size, bits, values),
                                  data)


def test_decode_mixed_widths_le4(pallas_on):
    """Widths 1..4 mixed — the packed decode must handle per-frame
    variation, not just uniform w=4."""
    rng = np.random.default_rng(4)
    parts = [rng.integers(0, 1 << w, 128 * 40, np.uint8)
             for w in (1, 2, 3, 4) for _ in range(3)]
    data = np.concatenate(parts)
    bits, values = fl_numpy.encode(data)
    np.testing.assert_array_equal(fl_jax.decode(data.size, bits, values),
                                  data)


@pytest.mark.parametrize("seed,size,hi", [(5, 100_000, 16), (6, 129, 3)])
def test_fold_unfold_p2_native_vs_numpy(seed, size, hi):
    nat = get_native()
    if nat is None:
        pytest.skip("native lib unavailable")
    data = np.random.default_rng(seed).integers(0, hi, size, np.uint8)
    bits, values = fl_numpy.encode(data)
    n = data.size
    frames = bits.size
    tile_w = TR * 128
    pw = -(-(frames * 32) // tile_w) * (tile_w // 2)

    packed_nat = nat.fl_unfold_p2(values, bits, n, 128, TR, pw)
    buf = np.zeros(2 * pw, np.uint32)
    flds = fields.unfold(values, bits, n, 128)
    buf[: flds.size] = flds
    packed_np = fields.pack_p2(buf, TR)
    np.testing.assert_array_equal(packed_nat, packed_np)

    np.testing.assert_array_equal(
        nat.fl_fold_p2(packed_nat, bits, n, 128, TR), values)
    np.testing.assert_array_equal(
        fields.fold_p2(packed_nat, bits, n, 128, TR), values)


def test_fold_p2_rejects_wide_widths():
    nat = get_native()
    if nat is None:
        pytest.skip("native lib unavailable")
    data = np.full(256, 255, np.uint8)
    bits, values = fl_numpy.encode(data)
    pw = TR * 128 // 2
    with pytest.raises(ValueError):
        nat.fl_unfold_p2(values, bits, data.size, 128, TR, pw)
    with pytest.raises(ValueError):
        nat.fl_fold_p2(np.zeros(pw, np.uint32), bits, data.size, 128, TR)
