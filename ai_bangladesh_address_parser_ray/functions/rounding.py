"""Engine-independent 6-decimal rounding for oracle-compared floats.

Round 4 showed that library ``round()`` tie-handling is NOT portable:
numpy / pyarrow round half-to-even while DuckDB's ``round(DOUBLE, 6)``
rounds half away from zero *after* an FP multiply — e.g. ``77/128 =
0.6015625`` (an exact dyadic tie at the 6th decimal, reachable by any
``u/n`` ratio with a power-of-two denominator) rounds to 0.601562 under
numpy and 0.601563 under DuckDB 1.0. Any column rounded with different
tie rules on the Ray and SQL sides is a latent hash mismatch.

The fix: round with PURE IEEE-754 primitives (multiply, floor, subtract,
compare, add, divide) that every engine implements identically, instead
of a library ``round()``:

    y = x * 1e6;  f = floor(y);  r = (f + (y - f >= 0.5)) / 1e6

``y - f`` is exact for ``|y| < 2^52`` (the integer part and the value
share an exponent window), so the half-up decision is deterministic and
the SQL twin built by :func:`sql_round6` evaluates to the bit-identical
double on any DuckDB build. Semantics: round-half-up toward +infinity at
the 6th decimal of the IEEE value (not of its shortest decimal repr).

NaN propagates; None is preserved by :func:`round6_scalar`.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow.compute as pc


def round6_np(x) -> np.ndarray:
    """Vectorized floor-based 6dp round of a float64 numpy array."""
    y = np.asarray(x, np.float64) * 1e6
    f = np.floor(y)
    return np.where(y - f >= 0.5, f + 1.0, f) / 1e6


def round6_arrow(arr):
    """Same rounding over a pyarrow float64 array/chunked array."""
    y = pc.multiply(arr, 1e6)
    f = pc.floor(y)
    up = pc.greater_equal(pc.subtract(y, f), 0.5)
    return pc.divide(pc.if_else(up, pc.add(f, 1.0), f), 1e6)


def round6_scalar(v):
    """Same rounding for one Python float; None passes through."""
    if v is None:
        return None
    y = v * 1e6
    f = float(math.floor(y))
    return (f + 1.0 if y - f >= 0.5 else f) / 1e6


def sql_round6(expr: str) -> str:
    """DuckDB expression computing the identical rounding of ``expr``.

    ``expr`` is evaluated three times textually; DuckDB scalar
    evaluation is deterministic, so all three see the same double.
    """
    y = f"(({expr}) * 1000000.0)"
    return (f"((floor({y}) + CASE WHEN {y} - floor({y}) >= 0.5 "
            f"THEN 1.0 ELSE 0.0 END) / 1000000.0)")
