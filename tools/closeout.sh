#!/usr/bin/env bash
# Round close-out — the SCRIPTED sealing step (r8 VERDICT item 5, missed
# twice as a manual habit; r9 VERDICT item 2 mandated a script). Run from
# the repo root at the sealing commit:
#
#   tools/closeout.sh <round-number>
#
# Produces, failing loudly if any step does:
#   1. BENCH_FULL_r{N}.json   — the complete bench sweep at sf0.1
#                               (the driver's own BENCH_r{N} truncates to
#                               an alphabetical tail)
#   2. PLANCENSUS_r{N}.json   — plan census of every batch registry entry
#                               (PlanCensus exits nonzero on any gap)
#   3. a freshness check that BENCH_NOTES.md has a "Round {N}" section
#   4. a doc-count check: the current registry size must appear in
#      .claude/skills/verify/SKILL.md (kept current per round)
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:?usage: tools/closeout.sh <round-number>}"
CPUS="${SPARK_GRAFT_CPUS:-32}"

echo "[closeout] 1/4 full bench sweep (sf0.1, local[$CPUS]) -> BENCH_FULL_r${N}.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_OUT="$PWD/BENCH_FULL_r${N}.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || {
    echo "[closeout] bench sweep failed"; exit 1; }
[ -s "BENCH_FULL_r${N}.json" ] || { echo "[closeout] no BENCH_FULL_r${N}.json"; exit 1; }

echo "[closeout] 2/4 plan census (sf0.001) -> PLANCENSUS_r${N}.json"
SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.tools.PlanCensus /root/testdata/sf0.001 $PWD/PLANCENSUS_r${N}.json" \
  2>&1 | grep -E '"queries"|INCOMPLETE' || {
    echo "[closeout] census failed"; exit 1; }
[ -s "PLANCENSUS_r${N}.json" ] || { echo "[closeout] no PLANCENSUS_r${N}.json"; exit 1; }

echo "[closeout] 3/4 BENCH_NOTES round section"
grep -q "Round ${N}" BENCH_NOTES.md || {
  echo "[closeout] BENCH_NOTES.md has no 'Round ${N}' section — write it"; exit 1; }

echo "[closeout] 4/4 doc freshness (registry count in SKILL.md)"
BATCH=$(python3 -c "import json; print(len(json.load(open('PLANCENSUS_r${N}.json'))))")
STREAM=$(grep -o '"q_stream_[a-z_]*"' src/main/scala/graft/streaming/Streams.scala | sort -u | wc -l)
TOTAL=$((BATCH + STREAM))
grep -q "$TOTAL" .claude/skills/verify/SKILL.md || {
  echo "[closeout] SKILL.md does not mention the current registry size" \
       "($TOTAL = $BATCH batch + $STREAM streaming) — refresh it"; exit 1; }

echo "[closeout] OK ($TOTAL registry entries) — commit BENCH_FULL_r${N}.json PLANCENSUS_r${N}.json and the notes"
