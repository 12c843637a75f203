"""Multi-host driver in its single-process degenerate form (the multi-
process paths share this code shape; the driver's dry-run compiles them)."""

import numpy as np

from fl_rl_compression_mpi_tpu import container
from fl_rl_compression_mpi_tpu.ops import fl_numpy, rl_numpy
from fl_rl_compression_mpi_tpu.parallel import multihost


def test_compress_fl_file_single_process(tmp_path):
    g = np.random.default_rng(0)
    data = g.integers(0, 32, 128 * 500 + 17, np.uint8)
    src = str(tmp_path / "in.bin")
    dst = str(tmp_path / "out.fl")
    data.tofile(src)
    multihost.compress_fl_file(src, dst, bucket_frames=16)
    comp = container.load_fl(dst)
    bits_g, values_g = fl_numpy.encode(data)
    np.testing.assert_array_equal(comp.bits, bits_g)
    np.testing.assert_array_equal(comp.values, values_g)


def test_compress_rl_file_single_process(tmp_path):
    g = np.random.default_rng(1)
    data = np.repeat(g.integers(0, 8, 2000, np.uint8), 37)
    src = str(tmp_path / "in.bin")
    dst = str(tmp_path / "out.rl")
    data.tofile(src)
    multihost.compress_rl_file(src, dst, bucket_frames=16)
    comp = container.load_rl(dst)
    np.testing.assert_array_equal(
        rl_numpy.decode(comp.counts, comp.values), data)


def test_decompress_fl_file_single_process(tmp_path):
    g = np.random.default_rng(2)
    data = g.integers(0, 64, 100_000, np.uint8)
    bits, values = fl_numpy.encode(data)
    src = str(tmp_path / "in.fl")
    dst = str(tmp_path / "out.bin")
    container.save_fl(src, container.FLCompressed(bits, values, data.size))
    multihost.decompress_fl_file(src, dst, bucket_frames=16)
    np.testing.assert_array_equal(np.fromfile(dst, np.uint8), data)


def test_init_distributed_noop():
    multihost.init_distributed(None)  # single-process: no-op


def test_synth_codec_width8_identity(tmp_path, monkeypatch):
    """FLRL_SYNTH_CODEC=1 (round 5, DCN-isolating bench mode): the
    per-rank encode is replaced with the width-8 identity container —
    still a VALID container that the real decoder round-trips."""
    import numpy as np

    from fl_rl_compression_mpi_tpu.parallel import multihost
    monkeypatch.setenv("FLRL_SYNTH_CODEC", "1")
    rng = np.random.default_rng(4)
    data = rng.integers(0, 16, 128 * 300 + 9, np.uint8)
    src = tmp_path / "in.bin"
    out = tmp_path / "out.fl"
    dec = tmp_path / "dec.bin"
    data.tofile(src)
    multihost.compress_fl_file(str(src), str(out))
    # container: widths all 8, payload == raw bytes
    from fl_rl_compression_mpi_tpu import container
    comp = container.load_fl(str(out))
    assert int(comp.bits.min()) == 8 and int(comp.bits.max()) == 8
    np.testing.assert_array_equal(comp.values, data)
    monkeypatch.delenv("FLRL_SYNTH_CODEC")
    multihost.decompress_fl_file(str(out), str(dec))
    np.testing.assert_array_equal(
        np.fromfile(dec, np.uint8), data)
