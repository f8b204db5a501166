#!/usr/bin/env python3
"""Row-AND-order determinism compare between two Verify output dirs.

Usage: determinism_compare.py <dirA> <dirB>

The driver's oracle compare sorts rows, so it cannot see
partition-order-sensitive results (e.g. a top-k tie broken by task
scheduling). This tool reads each query dir's parquet parts in
FILENAME order (parquet-mr part numbering is the commit order) and
compares the fetched row lists exactly, per query. Do NOT raw-byte-diff
the files instead: the footer's column-chunk encodings SET serializes
in hash order, so byte-identical-content files can differ by ~3 footer
bytes run to run; part filenames also embed per-run UUIDs. Dev-side
tool only — the product is the Scala library.
"""
import math
import os
import sys

import duckdb


def canon(v):
    """NaN-stable compare key: NaN != NaN under tuple ==, so a query
    emitting NaN doubles would report a false divergence on identical
    output. Maps NaN (incl. inside nested lists from array columns) to
    a sentinel; everything else compares as itself."""
    if isinstance(v, float) and math.isnan(v):
        return ("__nan__",)
    if isinstance(v, list):
        return [canon(x) for x in v]
    if isinstance(v, tuple):
        return tuple(canon(x) for x in v)
    return v


def rows(root: str, q: str):
    d = os.path.join(root, q)
    parts = sorted(p for p in os.listdir(d) if p.endswith(".parquet"))
    con = duckdb.connect()
    out = []
    for p in parts:
        out.extend(con.execute(
            "SELECT * FROM read_parquet(?)", [os.path.join(d, p)]
        ).fetchall())
    return [canon(r) for r in out]


def main():
    if len(sys.argv) != 3:
        print(__doc__.strip().splitlines()[2], file=sys.stderr)
        sys.exit(2)
    a, b = sys.argv[1], sys.argv[2]
    qs = sorted(q for q in os.listdir(a)
                if os.path.isdir(os.path.join(a, q)))
    qs_b = {q for q in os.listdir(b) if os.path.isdir(os.path.join(b, q))}
    if set(qs) != qs_b:
        print(f"DIFF query sets: only_a={set(qs) - qs_b} only_b={qs_b - set(qs)}")
        sys.exit(1)
    bad = []
    for q in qs:
        ra, rb = rows(a, q), rows(b, q)
        if ra != rb:
            bad.append(q)
            first = next((i for i, (x, y) in enumerate(zip(ra, rb))
                          if x != y), min(len(ra), len(rb)))
            print(f"DIFF {q}: rows {len(ra)} vs {len(rb)}, "
                  f"first divergence at row {first}")
    print(f"{len(qs) - len(bad)}/{len(qs)} queries row-and-order identical"
          + (f"; DIVERGENT: {bad}" if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
