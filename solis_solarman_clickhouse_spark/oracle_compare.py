"""Driver-faithful result canonicalization — the ONE implementation of
the external gate's comparator, shared by the test suite
(``tests/conftest.py``) and the full-registry sweep (``tools/sweep.py``)
so the two can never fork.

The external driver reads BOTH result sets through pandas
(``spark_df.toPandas()`` / ``duckdb_con.execute(sql).df()``), sorts
columns by name, sorts rows, and hashes cell representations. Reading
through pandas is load-bearing: DuckDB HUGEINT/DECIMAL widen to float64
and DATE to datetime64 there — representation divergences the
``fetchall()`` path silently masks. Top-level array/map cells crash the
driver's canonicalizer, so :func:`canon_pandas` raises on them too.
"""

from __future__ import annotations

import math

import numpy as np


def norm_cell(v):
    """Cell canonicalization with int/float TYPE TAGS — an int64 10000
    and a float64 10000.0 must compare UNEQUAL, exactly as they
    hash-differ in the driver's canonicalizer."""
    if v is None:
        return "␀"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        r = round(f, 4)
        return f"f:{0.0 if r == 0 else r:.4f}"
    return str(v)


def canon_pandas(pdf) -> list[tuple]:
    """Column-name-sorted, row-sorted, cell-normalized result set from a
    pandas DataFrame (the driver's path). Raises TypeError on list/dict
    cells, as the driver's canonicalizer does."""
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        for c in row:
            if isinstance(c, (list, dict, set, np.ndarray)):
                raise TypeError(
                    f"unhashable cell type {type(c).__name__}: top-level "
                    "array/map output columns crash the driver — serialize "
                    "them (array_to_string / concat_ws)"
                )
        out.append(tuple(norm_cell(c) for c in row))
    return sorted(out)
