"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at a given sf against its ``oracle_sql()`` through
DuckDB and compare row count, column names, and order-insensitive values
(columns sorted by name, rows sorted by all columns).

    python tools/check_oracle.py [--atol=X] [sf_dir] [query ...]

``--atol`` (default off = exact bit equality) compares FLOAT columns with
an absolute tolerance instead — for future genuinely-float ops only; the
integer-exact discipline of the existing ops must not be weakened.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def normalize(df):
    import pandas as pd
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def frames_equal(mine, ref, atol):
    """Exact ``DataFrame.equals`` by default; with ``atol`` set, float
    columns compare with absolute tolerance (NaN == NaN) instead."""
    if atol is None:
        return mine.equals(ref)
    import numpy as np
    for c in mine.columns:
        a, b = mine[c], ref[c]
        if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
            if not np.allclose(a.to_numpy(dtype="float64"),
                               b.to_numpy(dtype="float64"),
                               rtol=0.0, atol=atol, equal_nan=True):
                return False
        elif not a.equals(b):
            return False
    return True


def main(argv):
    import duckdb
    import ray

    atol = None
    for a in list(argv):
        if a.startswith("--atol="):
            atol = float(a.split("=", 1)[1])
            argv.remove(a)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    names = argv[1:] if len(argv) > 1 else list(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in names:
        try:
            mine = normalize(to_pandas(qs[name](sf_dir)))
        except Exception as ex:
            print(f"ERR  {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows {name}: {len(mine)} rows (no oracle)")
            continue
        try:
            ref = normalize(con.execute(oracles[name]).df())
        except Exception as ex:
            print(f"ERR  {name}: oracle raised {ex}")
            failures += 1
            continue
        ok_rows = len(mine) == len(ref)
        ok_cols = list(mine.columns) == list(ref.columns)
        ok_vals = ok_rows and ok_cols and frames_equal(mine, ref, atol)
        if ok_vals:
            print(f"OK   {name}: {len(mine)} rows")
        else:
            failures += 1
            print(f"BAD  {name}: rows {len(mine)} vs {len(ref)}, "
                  f"cols {list(mine.columns)} vs {list(ref.columns)}")
            if ok_rows and ok_cols:
                neq = (mine != ref).any(axis=1)
                print("  first diffs (mine | oracle):")
                print(mine[neq].head(3).to_string())
                print(ref[neq].head(3).to_string())
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
