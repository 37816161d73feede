#!/bin/sh
# sf0.1 correctness gate — the scale-regression probe the sf0.01 driver
# gate cannot provide (q27's recall bug was gate-green for 4 rounds while
# silently halving the sf0.1 answer; see VERDICT.md r7).
#
# Run once per round, BEFORE the final bench (never concurrently with a
# bench — it contaminates every timing; see CLAUDE.md).
#
# Usage: tools/gate_sf01.sh [artifact.json]
#   artifact defaults to CORRECTNESS_sf01_local.json; the round artifact
#   should be committed as CORRECTNESS_sf01_r{N}.json.
#
# Exclusions (documented, not hidden):
#  - q143_ppjoin / q149_ngram_jaccard: their DuckDB oracles are the
#    brute-force all-pairs DEFINITION (quadratic) — minutes at sf0.1.
#    Rows-only here; exact-compare runs at the sf0.01 driver gate, and
#    SetSimJoinSpec certifies recall 1 vs brute force on planted corpora.
#  - q26_neardup_minhash: documented probabilistic recall (over-cap LSH
#    buckets dropped per contract) — a diff at sf0.1 is expected and
#    recorded as EXPECTED_DIFF, not a failure. q27 (deterministic-recall
#    contract) has NO such exclusion: it must hash-match here.
set -e
cd "$(dirname "$0")/.."
ART="${1:-CORRECTNESS_sf01_local.json}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="${VERIFY_OUT:-/tmp/verify_sf01}"
rm -rf "$OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Verify $SF $OUT"
python3 tools/check.py "$SF" "$OUT" \
  --skip q143_ppjoin,q149_ngram_jaccard \
  --expect-diff q26_neardup_minhash \
  --json "$ART"
