"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf, compare against oracle_sql() via DuckDB (row count,
column names, order-insensitive values with float tolerance).  Usage:

    python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # canonical sort over every column for order-insensitive compare
    key_cols = [c for c in df.columns if df[c].dtype.kind not in "fO" or True]
    try:
        df = df.sort_values(list(df.columns), ignore_index=True)
    except Exception:
        df = df.sort_values(
            [c for c in df.columns if df[c].map(np.isscalar, na_action="ignore").all()],
            ignore_index=True,
        )
    return df


def compare(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """Mimic the DRIVER's gate: exact (non-tolerant) value comparison after
    sorting columns by name and rows by all columns.  Floats must be
    bit-identical (0 vs 0.0 and 1e-7-ulp drift both count as mismatches,
    exactly as the driver's value-hash sees them)."""
    issues = []
    if sorted(got.columns) != sorted(want.columns):
        issues.append(f"schema: got {sorted(got.columns)} want {sorted(want.columns)}")
        return issues
    if len(got) != len(want):
        issues.append(f"rows: got {len(got)} want {len(want)}")
        return issues
    g, w = norm(got), norm(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            if gv.dtype.kind != wv.dtype.kind:
                issues.append(
                    f"col {c}: dtype kind mismatch {gv.dtype} vs {wv.dtype} "
                    f"(driver hash distinguishes 0 from 0.0)"
                )
                continue
            ga = np.ascontiguousarray(gv.to_numpy(dtype=float))
            wa = np.ascontiguousarray(wv.to_numpy(dtype=float))
            both_nan = np.isnan(ga) & np.isnan(wa)
            # BITWISE compare (r4 lesson: `==` passes -0.0 == 0.0, but the
            # driver's value-hash is over the bytes — kernel_center shipped
            # red because this replica was weaker than the hash on signed
            # zeros).  NaNs canonicalized via the both_nan escape hatch.
            exact = (ga.view(np.int64) == wa.view(np.int64)) | both_nan
            if not exact.all():
                i = int(np.argmin(exact))
                issues.append(
                    f"col {c}: {(~exact).sum()} BITWISE mismatches, e.g. "
                    f"{ga[i]!r} vs {wa[i]!r}"
                )
        else:
            ga = gv.astype("object").where(pd.notna(gv), None)
            wa = wv.astype("object").where(pd.notna(wv), None)
            neq = ga.to_numpy() != wa.to_numpy()
            if neq.any():
                i = int(np.argmax(neq))
                issues.append(f"col {c}: {neq.sum()} mismatches, e.g. {ga.iloc[i]!r} vs {wa.iloc[i]!r}")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {str(e)[:150]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows={len(got)} ({dt:.1f}s) [rows-only]")
            n_pass += 1
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {str(e)[:150]}")
            n_fail += 1
            continue
        issues = compare(got, want)
        if issues:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(issues[:3]))
            n_fail += 1
        else:
            print(f"ok    {name}: rows={len(got)} ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
