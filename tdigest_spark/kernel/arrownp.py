"""Arrow → NumPy conversions that never touch pandas.

``pyarrow.Array.to_numpy(zero_copy_only=False)`` converts through
pandas, and the FIRST such call in a fresh Python worker pays the
pandas import (~0.18 s).  On a cold worker pool that import lands on
every task of every small job (and on a 1000-executor cluster it is
per-worker startup cost), so the engine's hot paths convert with
pyarrow-native fill/cast + a zero-copy view instead.

Only numpy and pyarrow are imported here — safe for executor-side
task closures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def arrow_floats(col: pa.Array) -> np.ndarray:
    """Numeric Arrow column → float64 NumPy, nulls as NaN (the same
    result the pandas fallback produced for nullable numerics)."""
    if col.type != pa.float64():
        col = col.cast(pa.float64(), safe=False)
    if col.null_count:
        col = col.fill_null(float("nan"))
    return col.to_numpy(zero_copy_only=True)


def arrow_ints(col: pa.Array, fill: int = 0) -> np.ndarray:
    """Integer Arrow column → exact int64 NumPy (never via float64 —
    that would corrupt hashes above 2^53); nulls become ``fill``."""
    if col.null_count:
        col = col.fill_null(fill)
    if col.type != pa.int64():
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=True)


def arrow_bools(col: pa.Array) -> np.ndarray:
    """Boolean Arrow column (no nulls) → NumPy bool (bit-unpacked via a
    uint8 cast, which zero-copies)."""
    return col.cast(pa.uint8()).to_numpy(zero_copy_only=True).view(np.bool_)
