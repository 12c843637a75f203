"""Differential tests against containers produced by the REFERENCE BINARY.

The goldens in ``tests/golden/reference/`` were written by the reference's
own CPU codec (``/root/reference/src/fl/fl_cpu.cu`` +
``src/file_io.cu:222-280``), compiled host-only by
``scripts/reference_oracle/build.sh`` and driven by
``scripts/make_reference_goldens.py``.  They are independent of every
implementation in this repo — a shared misreading of the pack order would
fail here even if all our backends agreed with each other.
"""

import glob
import os
import subprocess
import tempfile

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu import container
from fl_rl_compression_mpi_tpu.native import get_native
from fl_rl_compression_mpi_tpu.ops import fl_jax, fl_numpy

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden", "reference")
CASES = sorted(glob.glob(os.path.join(GOLD, "case_*.bin")))
ORACLE_BUILD = os.path.join(os.path.dirname(HERE), "scripts",
                            "reference_oracle", "build.sh")
REFERENCE_BMP = "/root/reference/example_input/sample_1280×853.bmp"


def _case(path):
    data = np.fromfile(path, np.uint8)
    blob = open(path[:-4] + ".fl", "rb").read()
    return data, blob


@pytest.mark.parametrize("path", CASES,
                         ids=[os.path.basename(p)[:-4] for p in CASES])
def test_numpy_encode_matches_reference_binary(path, tmp_path):
    data, blob = _case(path)
    bits, values = fl_numpy.encode(data)
    out = str(tmp_path / "ours.fl")
    container.save_fl(out, container.FLCompressed(bits, values, data.size))
    assert open(out, "rb").read() == blob


@pytest.mark.parametrize("path", CASES,
                         ids=[os.path.basename(p)[:-4] for p in CASES])
def test_decode_of_reference_container(path):
    data, _ = _case(path)
    comp = container.load_fl(path[:-4] + ".fl")
    assert np.array_equal(
        fl_numpy.decode(comp.input_size, comp.bits, comp.values), data)


def test_jax_backend_matches_reference_binary(tmp_path):
    # the device path (XLA kernel on CPU backend here) against the two
    # largest reference-binary goldens
    for path in CASES[-4:]:
        data, blob = _case(path)
        bits, values = fl_jax.encode(data)
        out = str(tmp_path / "ours.fl")
        container.save_fl(out, container.FLCompressed(bits, values,
                                                      data.size))
        assert open(out, "rb").read() == blob
        comp = container.load_fl(path[:-4] + ".fl")
        assert np.array_equal(
            fl_jax.decode(comp.input_size, comp.bits, comp.values), data)


def test_native_backend_matches_reference_binary(tmp_path):
    nat = get_native()
    if nat is None:
        pytest.skip("native unavailable")
    for path in CASES:
        data, blob = _case(path)
        bits, values = nat.fl_encode(data)
        out = str(tmp_path / "ours.fl")
        container.save_fl(out, container.FLCompressed(bits, values,
                                                      data.size))
        assert open(out, "rb").read() == blob


def test_sample_bmp_matches_reference_binary(tmp_path):
    gold = os.path.join(GOLD, "sample_bmp.fl")
    if not (os.path.exists(gold) and os.path.exists(REFERENCE_BMP)):
        pytest.skip("sample goldens unavailable")
    data = np.fromfile(REFERENCE_BMP, np.uint8)
    bits, values = fl_numpy.encode(data)
    out = str(tmp_path / "ours.fl")
    container.save_fl(out, container.FLCompressed(bits, values, data.size))
    assert open(out, "rb").read() == open(gold, "rb").read()


@pytest.fixture(scope="module")
def oracle_bin(tmp_path_factory):
    """Build the reference binary on the fly (cross-direction tests: the
    REFERENCE decodes OUR containers)."""
    if not os.path.exists("/root/reference/src/fl/fl_cpu.cu"):
        pytest.skip("reference tree unavailable")
    out = str(tmp_path_factory.mktemp("oracle") / "ref_oracle")
    r = subprocess.run(["sh", ORACLE_BUILD, out], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr.decode()[-200:]}")
    return out


def test_reference_binary_decodes_our_containers(oracle_bin, tmp_path):
    from fuzz_battery import battery
    for i, data in enumerate(battery()):
        if data.size == 0:
            continue  # reference loadCompressedFL mallocs 0 bytes; skip
        bits, values = fl_numpy.encode(data)
        ours = str(tmp_path / f"ours_{i}.fl")
        container.save_fl(ours, container.FLCompressed(bits, values,
                                                       data.size))
        back = str(tmp_path / f"back_{i}.bin")
        r = subprocess.run([oracle_bin, "d", ours, back],
                           capture_output=True)
        assert r.returncode == 0, r.stderr.decode()[-300:]
        assert np.array_equal(np.fromfile(back, np.uint8), data), i
