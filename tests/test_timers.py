"""Timer/observability layer (reference component #12, bugs fixed)."""

import numpy as np

from fl_rl_compression_mpi_tpu.utils.timers import Timer, _format_rate, timed


def test_timer_prints_rank_and_body(capsys):
    """The reference's dangling-else dropped the body when rank >= 0
    (cpu_timer.cu:19-27); both must print here."""
    t = Timer("load", rank=3)
    t.start()
    t.stop()
    t.print_result()
    out = capsys.readouterr().out
    assert "[Rank 3]" in out and "[TIMER] load:" in out and "ms" in out


def test_transfer_rate_scaling():
    assert _format_rate(5_000_000_000, 1.0) == "5.00 GB/s"
    assert _format_rate(5_000_000, 1.0) == "5.00 MB/s"
    assert _format_rate(5_000, 1.0) == "5.00 KB/s"
    assert _format_rate(5, 1.0) == "5.00 B/s"
    # zero interval must not print inf (reference defect)
    assert _format_rate(100, 0.0) == "n/a"


def test_timed_context(capsys):
    with timed("phase", nbytes=1 << 20):
        np.zeros(10)
    out = capsys.readouterr().out
    assert "[TIMER] phase:" in out and "B/s" in out


def test_timed_disabled(capsys):
    with timed("quiet", enabled=False):
        pass
    assert capsys.readouterr().out == ""
