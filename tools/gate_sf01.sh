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
#  - q143_ppjoin / q149_ngram_jaccard / q153_stream_setsim: their DuckDB
#    oracles are the brute-force all-pairs DEFINITION (quadratic) —
#    minutes at sf0.1. Rows-only here; exact-compare runs at the sf0.01
#    driver gate, and SetSimJoinSpec certifies recall 1 vs brute force on
#    planted corpora. q153 gets a STRONGER check below: its converged
#    stream result must be row-identical to q143's batch answer (same
#    definition, independent code paths — batch rarity-ordered PPJoin vs
#    incremental hash-ordered index).
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
  --skip q143_ppjoin,q149_ngram_jaccard,q153_stream_setsim \
  --expect-diff q26_neardup_minhash \
  --json "$ART"
# cross-path check: the incremental stream result (q153) must equal the
# batch PPJoin answer (q143) exactly — same all-pairs definition.
python3 - "$OUT" <<'EOF'
import sys, duckdb
out = sys.argv[1]
n = duckdb.sql(f"""
  SELECT count(*) FROM (
    (SELECT ia, ib, jaccard FROM '{out}/q143_ppjoin/*.parquet'
     EXCEPT
     SELECT ia, ib, jaccard FROM '{out}/q153_stream_setsim/*.parquet')
    UNION ALL
    (SELECT ia, ib, jaccard FROM '{out}/q153_stream_setsim/*.parquet'
     EXCEPT
     SELECT ia, ib, jaccard FROM '{out}/q143_ppjoin/*.parquet'))
""").fetchone()[0]
if n:
    print(f"FAIL q153 vs q143 cross-path: {n} differing rows"); sys.exit(1)
print("PASS q153_stream_setsim == q143_ppjoin (cross-path exact match)")
EOF
# cross-path check: the incremental span scrub (q228) must equal the
# batch excision answer (q220) exactly — same W20 reduction, independent
# code paths (batch rep-probe join vs streaming bidirectional events).
python3 - "$OUT" <<'EOF'
import sys, duckdb
out = sys.argv[1]
n = duckdb.sql(f"""
  SELECT count(*) FROM (
    (SELECT * FROM '{out}/q220_span_scrub/*.parquet'
     EXCEPT
     SELECT * FROM '{out}/q228_stream_spanscrub/*.parquet')
    UNION ALL
    (SELECT * FROM '{out}/q228_stream_spanscrub/*.parquet'
     EXCEPT
     SELECT * FROM '{out}/q220_span_scrub/*.parquet'))
""").fetchone()[0]
if n:
    print(f"FAIL q228 vs q220 cross-path: {n} differing rows"); sys.exit(1)
print("PASS q228_stream_spanscrub == q220_span_scrub (cross-path exact match)")
EOF
# cross-path check: the incremental phash index (q155) must equal the
# batch perceptual-hash answer (q152) exactly — same banding definition,
# independent code paths (batch sub-banding vs streaming banded index).
python3 - "$OUT" <<'EOF'
import sys, duckdb
out = sys.argv[1]
n = duckdb.sql(f"""
  SELECT count(*) FROM (
    (SELECT id_a, id_b, hamming FROM '{out}/q152_phash_neardup/*.parquet'
     EXCEPT
     SELECT id_a, id_b, hamming FROM '{out}/q155_stream_phash/*.parquet')
    UNION ALL
    (SELECT id_a, id_b, hamming FROM '{out}/q155_stream_phash/*.parquet'
     EXCEPT
     SELECT id_a, id_b, hamming FROM '{out}/q152_phash_neardup/*.parquet'))
""").fetchone()[0]
if n:
    print(f"FAIL q155 vs q152 cross-path: {n} differing rows"); sys.exit(1)
print("PASS q155_stream_phash == q152_phash_neardup (cross-path exact match)")
EOF
