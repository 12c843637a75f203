"""CLI round-trip tests (in-process, CPU mesh from conftest)."""

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu.cli import main


@pytest.fixture
def blob(tmp_path):
    g = np.random.default_rng(0)
    data = g.integers(0, 32, 128 * 300 + 55, np.uint8)
    p = str(tmp_path / "in.bin")
    data.tofile(p)
    return p, data


@pytest.mark.parametrize("method", [
    "fl", "fl-cpu", "fl-dist", "fl-ici", "fl-mpi", "fl-nccl",
    "rl", "rl-cpu", "rl-dist"])
def test_roundtrip(method, blob, tmp_path):
    src, data = blob
    comp = str(tmp_path / "out.comp")
    back = str(tmp_path / "out.bin")
    assert main(["c", method, src, comp]) == 0
    assert main(["d", method, comp, back]) == 0
    np.testing.assert_array_equal(np.fromfile(back, np.uint8), data)


def test_methods_interoperate(blob, tmp_path):
    """Every FL method reads every other FL method's container."""
    src, data = blob
    a = str(tmp_path / "a.fl")
    assert main(["c", "fl-cpu", src, a]) == 0
    for d_method in ("fl", "fl-dist"):
        back = str(tmp_path / f"{d_method}.bin")
        assert main(["d", d_method, a, back]) == 0
        np.testing.assert_array_equal(np.fromfile(back, np.uint8), data)


def test_fl_shmem_alias(blob, tmp_path, capsys):
    src, data = blob
    comp = str(tmp_path / "o.fl")
    assert main(["c", "fl-shmem", src, comp]) == 0
    back = str(tmp_path / "o.bin")
    assert main(["d", "fl", comp, back]) == 0
    np.testing.assert_array_equal(np.fromfile(back, np.uint8), data)


def test_bad_frame_length(blob, tmp_path):
    src, _ = blob
    assert main(["c", "fl", src, str(tmp_path / "x"),
                 "--frame-length", "100"]) == 2


def test_missing_input(tmp_path):
    assert main(["c", "fl", str(tmp_path / "nope.bin"),
                 str(tmp_path / "x")]) == 1


def test_timers_output(blob, tmp_path, capsys):
    src, _ = blob
    assert main(["c", "fl-cpu", src, str(tmp_path / "o.fl"),
                 "--timers"]) == 0
    out = capsys.readouterr().out
    assert "[TIMER] loading input" in out
    assert "[TIMER] compression" in out
    assert "B/s" in out  # throughput report


def test_timers_stage_lines(blob, tmp_path, capsys):
    """--timers prints PER-STAGE lines inside the codec drivers (kernel,
    D2H, host fold), mirroring the reference's per-phase timers
    (fl_gpu.cu:317-415, :573-637) — not just the CLI-level phases."""
    src, _ = blob
    comp = str(tmp_path / "o.fl")
    assert main(["c", "fl", src, comp, "--timers"]) == 0
    out = capsys.readouterr().out
    assert "[TIMER] Compression:" in out
    assert "[TIMER] Copy results to CPU:" in out
    assert main(["d", "fl", comp, str(tmp_path / "o.bin"),
                 "--timers"]) == 0
    out = capsys.readouterr().out
    assert "[TIMER] Decompression:" in out
    assert "[TIMER] Copy results to CPU:" in out
    # the switch must not leak into non---timers runs
    assert main(["c", "fl", src, comp]) == 0
    assert "[TIMER]" not in capsys.readouterr().out


def test_multihost_rank_tagged_stage_lines(blob, tmp_path, capsys):
    """The multihost driver prints rank-tagged per-stage [TIMER] lines
    (the reference's rank-tagged timer never printed — cpu_timer.cu:19-27
    dangling-else; file_io.cu:64 loader line)."""
    from fl_rl_compression_mpi_tpu.parallel import multihost
    from fl_rl_compression_mpi_tpu.utils.timers import set_stage_timers
    src, data = blob
    comp = str(tmp_path / "mh.fl")
    set_stage_timers(True, rank=0)
    try:
        multihost.compress_fl_file(src, comp)
    finally:
        set_stage_timers(False)
    out = capsys.readouterr().out
    assert "[Rank 0] [TIMER] Load data from file:" in out
    assert "[Rank 0] Loaded" in out
    assert "[Rank 0] [TIMER] Compression:" in out
    assert "[Rank 0] [TIMER] Save data to file:" in out


def test_custom_frame_length_roundtrip(blob, tmp_path):
    src, data = blob
    comp = str(tmp_path / "o.fl")
    back = str(tmp_path / "o.bin")
    assert main(["c", "fl", src, comp, "--frame-length", "64"]) == 0
    assert main(["d", "fl-cpu", comp, back, "--frame-length", "64"]) == 0
    np.testing.assert_array_equal(np.fromfile(back, np.uint8), data)


def test_verify_flag(blob, tmp_path, capsys):
    src, _ = blob
    assert main(["c", "fl-cpu", src, str(tmp_path / "v.fl"),
                 "--verify"]) == 0
    assert "verification OK" in capsys.readouterr().err


def test_verify_flag_rl(blob, tmp_path, capsys):
    src, _ = blob
    assert main(["c", "rl-cpu", src, str(tmp_path / "v.rl"),
                 "--verify"]) == 0
    assert "verification OK" in capsys.readouterr().err


def test_library_api_one_call(tmp_path):
    """Round-5 library API: compress/decompress in one call per
    direction, bytes- and file-level, method table exposed."""
    import numpy as np

    import fl_rl_compression_mpi_tpu as flrl
    from fl_rl_compression_mpi_tpu.ops import fl_numpy, rl_numpy
    rng = np.random.default_rng(9)
    data = rng.integers(0, 32, 128 * 64 + 9, np.uint8)
    assert "fl" in flrl.methods() and "fl-mpi" in flrl.methods()
    for method, golden in (("fl-cpu", fl_numpy), ("rl-cpu", rl_numpy)):
        comp = flrl.compress(data, method=method)
        np.testing.assert_array_equal(
            flrl.decompress(comp, method=method), data)
        # container files byte-identical to the golden encoder's
        src = tmp_path / f"in_{method}.bin"
        dst = tmp_path / f"out_{method}.c"
        back = tmp_path / f"back_{method}.bin"
        data.tofile(src)
        flrl.compress_file(str(src), str(dst), method=method)
        if method == "fl-cpu":
            bg, vg = golden.encode(data)
            exp = tmp_path / "exp.c"
            flrl.save_fl(str(exp), flrl.FLCompressed(bg, vg, data.size))
            assert open(dst, "rb").read() == open(exp, "rb").read()
        flrl.decompress_file(str(dst), str(back), method=method)
        np.testing.assert_array_equal(
            np.fromfile(back, np.uint8), data)
    # device-method dispatch resolves too (runs on CPU XLA here)
    comp = flrl.compress(data, method="fl")
    np.testing.assert_array_equal(flrl.decompress(comp, method="fl"),
                                  data)
