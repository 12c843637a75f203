"""bench.py smoke test on the CPU backend (tiny size, one JSON line)."""

import importlib.util
import json
import os
import sys


def test_bench_fl_smoke(capsys, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), os.pardir,
                                  "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--size-mb", "1", "--reps", "1",
                         "--json-only"])
    rc = bench.main()
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "fl_kernel_throughput"
    assert rec["unit"] == "GB/s"
    assert rec["value"] > 0
    assert 0 < rec["ratio"] < 1
