"""Numpy helpers shared by the Python-side execution paths."""

from __future__ import annotations

import numpy as np


def round_half_away(a: np.ndarray, ndigits: int) -> np.ndarray:
    """Round half away from zero — the rule BOTH Spark's F.round
    (HALF_UP) and DuckDB's ROUND apply to doubles.

    numpy's np.round is banker's rounding (half to even): a value whose
    scaled form lands exactly on .5 (e.g. 0.1234565 → 123456.5) rounds
    DOWN under np.round but UP under SQL ROUND — a cross-engine parity
    break. Every Python-side score that gets compared against a SQL
    oracle must round with this function instead.
    """
    f = 10.0 ** ndigits
    return np.sign(a) * np.floor(np.abs(a) * f + 0.5) / f
