"""Committed golden containers — detects any container-format drift.

The fixtures in tests/golden/ were produced once by the NumPy golden codecs
(whose semantics are pinned to the reference CPU codec) and committed; every
backend must keep reproducing them byte-for-byte forever.
"""

import os

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu import container
from fl_rl_compression_mpi_tpu.models.registry import CODECS

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def golden_input():
    return np.fromfile(os.path.join(GOLDEN, "input.bin"), np.uint8)


@pytest.mark.parametrize("name", [n for n, c in CODECS.items()
                                  if c.family == "fl"])
def test_fl_backends_reproduce_golden_container(name, golden_input,
                                                tmp_path):
    comp = CODECS[name].compress(golden_input)
    out = str(tmp_path / "out.fl")
    container.save_fl(out, comp)
    want = open(os.path.join(GOLDEN, "input.fl"), "rb").read()
    assert open(out, "rb").read() == want, f"{name} drifted from golden"


@pytest.mark.parametrize("name", ["rl", "rl-cpu"])
def test_rl_backends_reproduce_golden_container(name, golden_input,
                                                tmp_path):
    comp = CODECS[name].compress(golden_input)
    out = str(tmp_path / "out.rl")
    container.save_rl(out, comp)
    want = open(os.path.join(GOLDEN, "input.rl"), "rb").read()
    assert open(out, "rb").read() == want, f"{name} drifted from golden"


@pytest.mark.parametrize("name", [n for n, c in CODECS.items()
                                  if c.family == "fl"])
def test_fl_backends_decode_golden_container(name, golden_input):
    comp = container.load_fl(os.path.join(GOLDEN, "input.fl"))
    out = CODECS[name].decompress(comp)
    np.testing.assert_array_equal(out, golden_input)


def test_rl_decode_golden(golden_input):
    comp = container.load_rl(os.path.join(GOLDEN, "input.rl"))
    for name in ("rl", "rl-cpu", "rl-dist"):
        np.testing.assert_array_equal(
            CODECS[name].decompress(comp), golden_input)
