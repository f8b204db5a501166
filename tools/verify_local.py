#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: verify_local.py <sfDir> <outDir>
  (run after `sbt "runMain graft.Verify <sfDir> <outDir>"`)

For each <outDir>/<name> parquet dump, runs <outDir>/oracle_sql.json[name]
in DuckDB with views over the <sfDir> tables, sorts columns by name, and
compares row multisets exactly. Dev-side tool only — the product is the
Scala library.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).df()
            got = pd.read_parquet(f"{out_dir}/{name}")
            w, g = canon(want), canon(got)
            if list(w.columns) != list(g.columns):
                print(f"FAIL {name}: columns want={list(w.columns)} got={list(g.columns)}")
                n_fail += 1
                continue
            if len(w) != len(g):
                print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
                n_fail += 1
                continue
            if w.equals(g):
                # pandas equals treats -0.0 == +0.0, but the driver's
                # value HASH distinguishes them (the r9 q_weighted_sample
                # fail) — flag any signed-zero divergence explicitly.
                sz = []
                for c in w.columns:
                    if pd.api.types.is_float_dtype(w[c]):
                        d = np.signbit(w[c].to_numpy()) != np.signbit(g[c].to_numpy())
                        d &= ~(np.isnan(w[c].to_numpy()) & np.isnan(g[c].to_numpy()))
                        if d.any():
                            sz.append((c, int(d.sum())))
                if sz:
                    print(f"FAIL {name}: signed-zero divergence {sz}")
                    n_fail += 1
                else:
                    print(f"PASS {name} ({len(g)} rows)")
                    n_pass += 1
            else:
                neq = (w != g) & ~(w.isna() & g.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())}/{len(w)} rows differ; first diffs:")
                print(pd.concat([w[bad].head(3).add_suffix("_want"),
                                 g[bad].head(3).add_suffix("_got")], axis=1).to_string())
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
