"""Local mimic of the driver's correctness gate: Ray queries vs DuckDB oracles.

Usage:  python scripts/check_contract.py [query_name ...]
Set SF via editing SF below or running from the repo root; compares every
``queries()`` entry against its ``oracle_sql()`` (row count + schema +
exact values, column-sorted) and prints rows-only summaries for the rest.
"""
import sys, time, traceback
import duckdb
import pandas as pd
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def to_df(x):
    import pyarrow as pa
    import ray.data as rd
    if isinstance(x, rd.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

only = sys.argv[1:] if len(sys.argv) > 1 else None
qs = entrymod.queries()
oracles = entrymod.oracle_sql()
results = {}
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        rdf = to_df(fn(SF))
    except Exception:
        print(f"[{name}] RAY ERROR")
        traceback.print_exc()
        results[name] = "ray_error"
        continue
    dt = time.time() - t0
    if name not in oracles:
        print(f"[{name}] rows-only: {len(rdf)} rows, cols={list(rdf.columns)} ({dt:.1f}s)")
        results[name] = f"rows_only:{len(rdf)}"
        continue
    try:
        odf = con.execute(oracles[name]).df()
    except Exception:
        print(f"[{name}] SQL ERROR")
        traceback.print_exc()
        results[name] = "sql_error"
        continue
    a, b = norm(rdf), norm(odf)
    ok_rows = len(a) == len(b)
    ok_cols = list(a.columns) == list(b.columns)
    ok_vals = False
    ok_dtypes = False
    if ok_rows and ok_cols:
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            ok_vals = True
        except AssertionError as e:
            print(f"[{name}] VALUE MISMATCH: {str(e)[:300]}")
        # the driver's value hash is dtype-sensitive (HUGEINT->float64 and
        # timestamp-resolution artifacts hash differently): check strictly
        ok_dtypes = list(map(str, a.dtypes)) == list(map(str, b.dtypes))
        if ok_vals and not ok_dtypes:
            print(f"[{name}] DTYPE MISMATCH: ray={dict(a.dtypes.astype(str))} "
                  f"sql={dict(b.dtypes.astype(str))}")
    ok_all = ok_rows and ok_cols and ok_vals and ok_dtypes
    status = "OK" if ok_all else (
        f"FAIL rows={ok_rows}({len(a)}/{len(b)}) cols={ok_cols} "
        f"vals={ok_vals} dtypes={ok_dtypes}")
    if not ok_cols:
        print(f"[{name}] cols ray={list(a.columns)} sql={list(b.columns)}")
    print(f"[{name}] {status} ({dt:.1f}s)")
    results[name] = status
print("\nSUMMARY:", sum(1 for v in results.values() if v == "OK"), "OK /", len(results))
ray.shutdown()
