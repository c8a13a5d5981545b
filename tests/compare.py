"""Order-insensitive DataFrame comparison mirroring the driver's oracle
check: row count + column names + value comparison with float tolerance."""

from __future__ import annotations

import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows by all columns."""
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif isinstance(s.dtype, pd.CategoricalDtype) or s.dtype == object:
            out[c] = s.astype(str)
    sort_cols = list(out.columns)
    return out.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def assert_frames_match(actual: pd.DataFrame, expected: pd.DataFrame,
                        rtol: float = 1e-6, atol: float = 1e-9) -> None:
    a, e = canon(actual), canon(expected)
    assert list(a.columns) == list(e.columns), f"columns {list(a.columns)} != {list(e.columns)}"
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(e[c]):
            ok = np.isclose(
                a[c].to_numpy(dtype=float), e[c].to_numpy(dtype=float),
                rtol=rtol, atol=atol, equal_nan=True,
            )
            assert ok.all(), f"column {c}: {int((~ok).sum())} mismatches, e.g. " \
                f"{a[c][~ok].head(3).tolist()} vs {e[c][~ok].head(3).tolist()}"
        else:
            same = (a[c].astype(str) == e[c].astype(str)) | (a[c].isna() & e[c].isna())
            assert same.all(), f"column {c}: {int((~same).sum())} mismatches, e.g. " \
                f"{a[c][~same].head(3).tolist()} vs {e[c][~same].head(3).tolist()}"
