"""bench.py self-adjudication: the noise-flag threshold must be
probe-normalized (r6). The r5 driver round was uniformly ~1.5× noisy and
produced two false flags at exactly the window factor; with the threshold
scaled by probe/quiet_ref, a leg that merely tracks the window never
flags, while a genuine regression still does in any window (it multiplies
ON TOP of the noise). Pure-function tests — no Spark session.
"""

from __future__ import annotations

import bench

QUIET = 2.77  # the recorded quiet-window probe reference


def test_quiet_window_keeps_base_threshold():
    # probe at its reference → factor 1 → the classic max(1.5x, +0.5s)
    assert bench.noise_threshold(1.0, QUIET, QUIET) == 1.5
    assert bench.noise_threshold(0.1, QUIET, QUIET) == 0.6  # absolute floor


def test_noisy_window_tracking_leg_does_not_flag():
    # 1.5x-noisy window (the r5 driver round): a 1.0s-reference leg
    # reading 1.5s is the WINDOW, not a regression — stays under threshold
    probe = 1.5 * QUIET
    thresh = bench.noise_threshold(1.0, probe, QUIET)
    assert 1.5 < thresh  # the false-flag of r5 (leg at ~window factor)
    assert thresh == 1.5 * 1.5  # scaled exactly by the window factor


def test_genuine_regression_still_flags_in_noisy_window():
    # a genuinely 2x-slower leg in a 1.5x window reads ~3.0s; the scaled
    # threshold is 2.25s → still flagged
    probe = 1.5 * QUIET
    observed = 2.0 * 1.5  # regression x window
    assert observed > bench.noise_threshold(1.0, probe, QUIET)


def test_quieter_than_reference_window_does_not_loosen():
    # factor floors at 1: a half-quiet probe must not shrink the gate
    assert bench.noise_threshold(1.0, QUIET / 2, QUIET) == 1.5


def test_unadjudicatable_window_caps_at_4x():
    # a 10x window is beyond adjudication — flags are the honest output
    assert bench.noise_threshold(1.0, 10 * QUIET, QUIET) == 1.5 * 4.0


def test_no_reference_no_threshold():
    assert bench.noise_threshold(None, QUIET, QUIET) is None
    # no quiet probe recorded → unscaled base rule
    assert bench.noise_threshold(1.0, 10 * QUIET, None) == 1.5
