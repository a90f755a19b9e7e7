#!/usr/bin/env bash
# Round close-out — the SCRIPTED sealing step (r8 VERDICT item 5, missed
# twice as a manual habit; r9 VERDICT item 2 mandated a script). Run from
# the repo root at the sealing commit:
#
#   tools/closeout.sh <round-number>
#
# Produces, failing loudly if any step does:
#   1. ORACLE_r{N}.json       — the FULL oracle gate (graft.Verify at
#                               sf0.01 + tools/oracle_check.py), per-query
#                               OK/FAIL + totals; FAILS on any red row.
#                               Builder-side gate evidence committed with
#                               the seal — round 11's official
#                               CORRECTNESS_r11.json arrived EMPTY and only
#                               a judge-side re-run proved the round green
#                               (r11 VERDICT item 2).
#   2. BENCH_CONTROLS_r{N}.json — page-cache pre-touch (quiesce) + the ten
#                               scan-bound controls with round-over-round
#                               ratios (r13 VERDICT item 4: box-state
#                               shifts detected mechanically)
#   3. BENCH_FULL_r{N}.json   — the complete bench sweep at sf0.1
#                               (the driver's own BENCH_r{N} truncates to
#                               an alphabetical tail)
#   3. PLANCENSUS_r{N}.json   — plan census of every batch registry entry
#                               (PlanCensus exits nonzero on any gap)
#   4. a freshness check that BENCH_NOTES.md has a "Round {N}" section
#   5. a doc-count check: the current registry size must appear in
#      .claude/skills/verify/SKILL.md (kept current per round)
#   6. a leak grep over src/tools/build.sbt mirroring the driver's seven
#      LEAKCHECK categories — committed evidence the tree is clean
#      (r11 VERDICT item 10)
#   7. CLOSEOUT_r{N}.stamp — the git tree hashes of src/, tools/ and
#      build.sbt the artifacts were generated against
#
#   tools/closeout.sh verify <round-number>
#
# re-derives those tree hashes from the CURRENT tree and fails if any
# differs from the stamp — the r10 failure mode was a post-seal commit
# followed by regenerating only HALF the artifacts (bench but not
# census); the stamp makes a stale seal mechanically detectable, so run
# `verify` as the last step before (and after) the sealing commit.
set -euo pipefail
cd "$(dirname "$0")/.."

seal_tree_hashes() {
  # working-tree content hash of ONLY the sealed paths (src tools
  # build.sbt) — built from an EMPTY temp index, so unrelated commits
  # (docs, artifacts) cannot flip the stamp (v1 copied the full index
  # and the very first artifact commit tripped its own guard)
  local tmp_index
  tmp_index=$(mktemp)
  trap 'rm -f "$tmp_index"' RETURN
  rm -f "$tmp_index"
  GIT_INDEX_FILE="$tmp_index" git read-tree --empty
  GIT_INDEX_FILE="$tmp_index" git add src tools build.sbt 2>/dev/null
  GIT_INDEX_FILE="$tmp_index" git write-tree
}

if [ "${1:-}" = "verify" ]; then
  N="${2:?usage: tools/closeout.sh verify <round-number>}"
  STAMP="CLOSEOUT_r${N}.stamp"
  [ -s "$STAMP" ] || { echo "[closeout] no $STAMP — run tools/closeout.sh $N first"; exit 1; }
  NOW=$(seal_tree_hashes)
  THEN=$(cat "$STAMP")
  if [ "$NOW" != "$THEN" ]; then
    echo "[closeout] STALE SEAL: src/tools/build.sbt tree is $NOW but the" \
         "round-$N artifacts were generated at $THEN — re-run the FULL" \
         "tools/closeout.sh $N (bench AND census), never half of it"
    exit 1
  fi
  echo "[closeout] verify OK: round-$N artifacts match the current tree ($NOW)"
  exit 0
fi

N="${1:?usage: tools/closeout.sh <round-number>}"
CPUS="${SPARK_GRAFT_CPUS:-32}"

echo "[closeout] 1/8 oracle gate (Verify sf0.01 + DuckDB compare) -> ORACLE_r${N}.json"
VOUT=$(mktemp -d /tmp/closeout_verify.XXXXXX)
SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $VOUT" \
  > "$VOUT/verify.log" 2>&1 || { echo "[closeout] Verify crashed — see $VOUT/verify.log"; exit 1; }
if grep -E '\[verify\].*failed' "$VOUT/verify.log"; then
  echo "[closeout] Verify had per-query failures (above)"; exit 1; fi
python3 tools/oracle_check.py /root/testdata/sf0.01 "$VOUT" "" "ORACLE_r${N}.json" \
  > "$VOUT/oracle.log" 2>&1 || {
    grep -E '^\[FAIL' "$VOUT/oracle.log" | head -20
    echo "[closeout] oracle gate RED — see $VOUT/oracle.log"; exit 1; }
tail -1 "$VOUT/oracle.log"
python3 - "ORACLE_r${N}.json" <<'EOF'
import json, sys
s = json.load(open(sys.argv[1]))
assert s["fail"] == 0, f"oracle gate red: {s['fail']} FAIL"
assert s["ok"] > 0, "oracle gate empty"
EOF
rm -rf "$VOUT"

echo "[closeout] 1b/8 flag-on parity sweep (sf0.01) -> PARITY_r${N}.json"
# r13: every registry query, distributedRank flag off vs on, checksum +
# routing counts; ParityCheck exits nonzero on any mismatch
SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.tools.ParityCheck /root/testdata/sf0.01 $PWD/PARITY_r${N}.json" \
  > /tmp/closeout_parity.log 2>&1 || {
    tail -5 /tmp/closeout_parity.log
    echo "[closeout] parity sweep FAILED (mismatch or crash)"; exit 1; }
grep -o '\[parity\] [0-9]* queries.*' /tmp/closeout_parity.log | tail -1
[ -s "PARITY_r${N}.json" ] || { echo "[closeout] no PARITY_r${N}.json"; exit 1; }

echo "[closeout] 2/8 bench controls + page-cache pre-touch (sf0.1) -> BENCH_CONTROLS_r${N}.json"
# r14 (r13 VERDICT item 4): the quiesce/pre-touch step plus the ten
# untouched scan-bound controls as a first-class artifact — a uniform
# box-state shift in the sweep that follows is then detected
# mechanically (median control ratio vs the PREVIOUS round's BENCH_FULL),
# not forensically. Runs immediately before the sweep so the sweep
# inherits the pre-touched cache.
PREV_BENCH=""
for CAND in $(ls BENCH_FULL_r*.json 2>/dev/null | sort -V); do
  [ "$CAND" = "BENCH_FULL_r${N}.json" ] || PREV_BENCH="$CAND"
done
SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.tools.BenchControls /root/testdata/sf0.1 $PWD/BENCH_CONTROLS_r${N}.json $PREV_BENCH" \
  > /tmp/closeout_controls.log 2>&1 || {
    tail -5 /tmp/closeout_controls.log
    echo "[closeout] bench controls FAILED"; exit 1; }
grep -o '\[controls\] wrote.*' /tmp/closeout_controls.log | tail -1
[ -s "BENCH_CONTROLS_r${N}.json" ] || { echo "[closeout] no BENCH_CONTROLS_r${N}.json"; exit 1; }

echo "[closeout] 3/8 full bench sweep (sf0.1, local[$CPUS]) -> BENCH_FULL_r${N}.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_OUT="$PWD/BENCH_FULL_r${N}.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || {
    echo "[closeout] bench sweep failed"; exit 1; }
[ -s "BENCH_FULL_r${N}.json" ] || { echo "[closeout] no BENCH_FULL_r${N}.json"; exit 1; }

echo "[closeout] 4/8 plan census (sf0.001) -> PLANCENSUS_r${N}.json"
SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.tools.PlanCensus /root/testdata/sf0.001 $PWD/PLANCENSUS_r${N}.json" \
  2>&1 | grep -E '"queries"|INCOMPLETE' || {
    echo "[closeout] census failed"; exit 1; }
[ -s "PLANCENSUS_r${N}.json" ] || { echo "[closeout] no PLANCENSUS_r${N}.json"; exit 1; }

echo "[closeout] 5/8 BENCH_NOTES round section"
grep -q "Round ${N}" BENCH_NOTES.md || {
  echo "[closeout] BENCH_NOTES.md has no 'Round ${N}' section — write it"; exit 1; }

echo "[closeout] 6/8 doc freshness (registry count in SKILL.md)"
BATCH=$(python3 -c "import json; print(len(json.load(open('PLANCENSUS_r${N}.json'))))")
STREAM=$(grep -o '"q_stream_[a-z_]*"' src/main/scala/graft/streaming/Streams.scala | sort -u | wc -l)
TOTAL=$((BATCH + STREAM))
# word-anchored AND near the round line: a bare substring match could hit
# the digits inside a larger number or a stale prose mention (r10 ADVICE)
grep -E "As of round [0-9]+.*\b${TOTAL}\b|\b${TOTAL}\b.*registry" \
    .claude/skills/verify/SKILL.md >/dev/null || {
  echo "[closeout] SKILL.md does not mention the current registry size" \
       "($TOTAL = $BATCH batch + $STREAM streaming) on its 'As of round'" \
       "line — refresh it"; exit 1; }

echo "[closeout] 7/8 leak grep (seven LEAKCHECK categories over src tools build.sbt)"
# patterns mirror the driver's LEAKCHECK categories: internal imports/
# packages, internal URLs/buckets, short links, API keys, internal env
# vars. Word-boundary anchored; any hit fails the seal.
LEAKS=0
leak() { # label regex
  local hits
  hits=$(grep -rInE "$2" src tools build.sbt 2>/dev/null | grep -v 'closeout.sh' || true)
  if [ -n "$hits" ]; then
    echo "[closeout] LEAK ($1):"; echo "$hits" | head -5; LEAKS=1
  fi
}
leak internal-import 'import (com|io)\.anthropic|from anthropic'
leak internal-url 'anthropic\.com|claude\.ai|console\.anthropic'
leak internal-pkg2 'claude[-_]?(cli|code|internal)|capybara|tengu'
leak internal-bucket 's3://(anthropic|ant-)|gs://(anthropic|ant-)'
leak slack-link 'go/[a-z-]{2,}[^a-zA-Z]|slack\.com|#claude-'
leak api-key 'sk-ant-|AKIA[0-9A-Z]{16}|api[_-]?key *= *"[^"]{12}'
leak axon-env 'ANTHROPIC_[A-Z_]+|CLAUDE_[A-Z_]+'
[ "$LEAKS" = 0 ] || { echo "[closeout] leak grep FAILED"; exit 1; }
echo "[closeout] leak grep clean (7 categories, 0 hits)"

echo "[closeout] 8/8 seal stamp -> CLOSEOUT_r${N}.stamp"
seal_tree_hashes > "CLOSEOUT_r${N}.stamp"

echo "[closeout] OK ($TOTAL registry entries) — commit ORACLE_r${N}.json BENCH_FULL_r${N}.json PLANCENSUS_r${N}.json CLOSEOUT_r${N}.stamp and the notes, then run: tools/closeout.sh verify ${N}"
