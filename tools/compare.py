#!/usr/bin/env python3
"""Local dev mirror of the driver's t2 gate: run graft.Verify output
against the DuckDB oracle SQL and diff per query.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>
(Run `sbt "runMain graft.Verify <sf_dir> <out_dir>"` first.)
"""
import json
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize ns/us timestamps and NaN/None; widen integer/float
    # widths to 64-bit so the dtype gate below compares KIND (int vs
    # float vs bool vs object), not storage width
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
        elif pd.api.types.is_bool_dtype(df[c]):
            pass
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    # the DRIVER canonicalizes row order by sorting on every column —
    # replicate it so its failure modes reproduce here (r11: a
    # top-level array<bigint> column raised "unhashable type:
    # numpy.ndarray" in the driver while this mirror passed, hiding
    # the one red row). Queries must emit scalar columns only
    # (stringify arrays with array_join / array_to_string).
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.sql(sql).df())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs "
                      f"{list(want.columns)}")
                n_fail += 1
                continue
            # dtype gate (r12 lesson: DuckDB's sum(BIGINT) is HUGEINT,
            # which pandas renders float64 — values equal, driver hash
            # broken; this mirror must fail what the driver fails)
            dt_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                      for c in got.columns
                      if str(got[c].dtype) != str(want[c].dtype)]
            if dt_bad:
                print(f"FAIL {name}: dtypes {dt_bad} "
                      "(CAST the oracle output — likely an un-cast sum)")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
                n_fail += 1
                continue
            diffs = []
            for c in got.columns:
                a, b = got[c], want[c]
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    eq = (a.isna() & b.isna()) | (a == b)
                else:
                    eq = (a.isna() & b.isna()) | (a.astype(str) == b.astype(str))
                if not eq.all():
                    i = int((~eq).idxmax())
                    diffs.append(f"{c}[row {i}]: {a[i]!r} vs {b[i]!r} "
                                 f"({int((~eq).sum())} diffs)")
            if diffs:
                print(f"FAIL {name}: " + "; ".join(diffs[:4]))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
