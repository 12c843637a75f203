"""bench_matrix driver smoke test (1 MiB, host codecs, CPU)."""

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_matrix_smoke(tmp_path):
    out = str(tmp_path / "m.jsonl")
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_matrix.py"),
         "--sizes-mb", "1", "--methods", "fl-cpu", "rl-cpu",
         "--reps", "1", "--out", out],
        env=env, capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stdout + p.stderr
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2
    for r in recs:
        assert r["roundtrip_ok"], r
        assert r["encode_gbps"] > 0
