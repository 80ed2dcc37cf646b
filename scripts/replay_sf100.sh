#!/usr/bin/env bash
# Serial sf100 DuckDB replay driver: one check_oracle.py --indb run per
# query (concurrent replays ENOSPC each other on the shared disk — the
# round-15 operational lesson, recorded in CORRECTNESS_sf100._meta),
# folding each verdict into CORRECTNESS_sf100.json as it lands.
#
# Usage: replay_sf100.sh <out_dir> <name...>
set -u
OUT=${1:?out_dir}
shift
for name in "$@"; do
  echo "=== $(date -u +%H:%M:%S) replay $name ==="
  CHECK_ORACLE_MEM=${CHECK_ORACLE_MEM:-48GB} \
    python3 scripts/check_oracle.py target/sf100 "$OUT" \
      --json "target/cor_sf100_$name.json" --indb "$name"
  rc=$?
  if [ $rc -eq 0 ] || [ -s "target/cor_sf100_$name.json" ]; then
    python3 scripts/fold_correctness.py CORRECTNESS_sf100.json \
      "target/cor_sf100_$name.json"
  fi
  rm -rf /tmp/duckdb_spill
done
echo "=== replays complete ==="
