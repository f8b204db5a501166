#!/usr/bin/env bash
# The standing two-tier local correctness gate: Spark dump + DuckDB
# oracle compare at BOTH sf0.01 (the driver's tier) and sf0.1.
#
# Why two tiers: engines can agree at one data size and diverge at
# another when a value-distribution-dependent edge is hit — the r9
# signed-zero regression surfaced only because 5 of the top-20 sampling
# keys happened to land in (-5e-5, 0) at sf0.01; at another SF the same
# bug would have slipped the single-tier gate. Running both tiers
# doubles the sampled value surface for round()/tie/boundary artifacts.
#
# Usage: tools/verify_both.sh [q_a,q_b,...]   (subset optional)
set -euo pipefail
cd "$(dirname "$0")/.."
ONLY="${1:-}"
for sf in 0.01 0.1; do
  out="/tmp/verify_out_sf${sf}"
  echo "=== sf${sf}: Spark dump -> ${out}"
  SPARK_GRAFT_ONLY="$ONLY" sbt -batch \
    "runMain graft.Verify /root/testdata/sf${sf} ${out}" >/dev/null
  echo "=== sf${sf}: DuckDB oracle compare"
  python3 tools/verify_local.py "/root/testdata/sf${sf}" "${out}" | tail -1
done
