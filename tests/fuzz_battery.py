"""Deterministic adversarial byte streams shared by the test suite and the
reference-oracle golden generator (``scripts/make_reference_goldens.py``).

Covers the degenerate cases the reference guards (SURVEY.md §4): empty,
sub-frame, exact-frame, tail frames, all-zero (bit-width floor 1),
full-range, low-entropy, long runs straddling the 255 cap.
"""

import numpy as np


def battery():
    g = np.random.default_rng(1234)
    return [
        np.zeros(0, np.uint8),
        np.zeros(1, np.uint8),
        np.array([255], np.uint8),
        np.zeros(128, np.uint8),
        np.zeros(129, np.uint8),
        np.full(127, 1, np.uint8),
        np.full(128, 255, np.uint8),
        g.integers(0, 256, 1, np.uint8),
        g.integers(0, 2, 1024, np.uint8),
        g.integers(0, 16, 1000, np.uint8),
        g.integers(0, 256, 128 * 7 + 13, np.uint8),
        g.integers(0, 256, 4096, np.uint8),
        np.repeat(g.integers(0, 4, 64, np.uint8), 97)[:3000],
        np.full(255, 7, np.uint8),
        np.full(256, 7, np.uint8),
        np.full(510, 7, np.uint8),
        np.full(511, 7, np.uint8),
        np.full(1021, 7, np.uint8),
        np.concatenate([np.full(600, 3, np.uint8),
                        g.integers(0, 256, 600, np.uint8)]),
        np.arange(256, dtype=np.uint8).repeat(5),
        # tile-scale constant regions (the device kernels branch to
        # closed-form/static fast paths on run-free and uniform-width
        # tiles — these must stay bit-exact with the reference binary)
        np.concatenate([np.zeros(100_000, np.uint8),
                        g.integers(0, 256, 5_000, np.uint8)]),
        np.concatenate([np.full(70_000, 42, np.uint8),
                        g.integers(0, 16, 70_000, np.uint8),
                        np.full(33_000, 200, np.uint8)]),
        # tile-scale ODD-width uniform regions (b ∈ {3,5,6,7} full tiles
        # take the flat static-mask routing; ≥128 KiB guarantees whole
        # uniform tiles at the production 256-row tile size)
        (g.integers(4, 8, 140_000)).astype(np.uint8),
        (g.integers(16, 32, 140_000)).astype(np.uint8),
        np.concatenate([(g.integers(32, 64, 135_000)).astype(np.uint8),
                        (g.integers(64, 128, 135_000)).astype(np.uint8),
                        g.integers(0, 256, 9_000, np.uint8)]),
    ]
