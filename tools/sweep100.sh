#!/bin/bash
# Full-registry sweep at the sfx100 proxy (verdict r13 item 4).
# Chunked: java Verify -> check.py -> delete outputs on pass, so peak
# disk stays one chunk's outputs. Heavy families (pair dedup, graph)
# run last so the bulk of the record banks first.
set -u
cd /root/repo
SFX=/tmp/sfx100
OUT=/tmp/sweep100
LOG=/tmp/sweep100.log
: > "$LOG"
mkdir -p "$OUT"

run_chunk() {
  local name="$1"; shift
  local qs=("$@")
  echo "=== chunk $name (${#qs[@]} queries) $(date +%T) ===" | tee -a "$LOG"
  SPARK_GRAFT_CPUS=32 java -Xmx48g -cp "/tmp/sweep_cp:/opt/spark/jars/*" \
    graft.Verify "$SFX" "$OUT" "${qs[@]}" 2> "/tmp/sw_${name}.err"
  grep "\[verify\]" "/tmp/sw_${name}.err" | tee -a "$LOG"
  python3 tools/check.py "$SFX" "$OUT" "${qs[@]}" >> "$LOG" 2>&1
  local rc=$?
  tail -1 "$LOG"
  if [ $rc -eq 0 ]; then
    for q in "${qs[@]}"; do rm -rf "$OUT/$q"; done
  else
    echo "CHUNK $name HAD FAILURES (outputs kept)" | tee -a "$LOG"
  fi
}

mapfile -t ALL < /tmp/all_queries.txt

# classify
GRAPH=(graph_pagerank graph_triangles graph_jaccard_neighbors graph_bfs_levels graph_kcore_peel)
PAIRS=(dedup_docs_ngram_jaccard dedup_docs_ngram_join dedup_docs_ngram_indexed dedup_docs_containment dedup_docs_components dedup_docs_minhash dedup_docs_simhash dedup_embedding_neardup dedup_embedding_semantic vec_sim_join_blocked)
is_in() { local x="$1"; shift; for y in "$@"; do [ "$x" = "$y" ] && return 0; done; return 1; }

REST=()
for q in "${ALL[@]}"; do
  if ! is_in "$q" "${GRAPH[@]}" && ! is_in "$q" "${PAIRS[@]}"; then REST+=("$q"); fi
done

# run the bulk in chunks of 18
i=0; n=0
while [ $i -lt ${#REST[@]} ]; do
  chunk=("${REST[@]:$i:18}")
  run_chunk "c$n" "${chunk[@]}"
  i=$((i+18)); n=$((n+1))
done

run_chunk pairs1 "${PAIRS[@]:0:5}"
run_chunk pairs2 "${PAIRS[@]:5}"
run_chunk graph "${GRAPH[@]}"

echo "=== SWEEP COMPLETE $(date +%T) ===" | tee -a "$LOG"
grep -c "^PASS" "$LOG" | tee -a "$LOG"
grep "^FAIL\|no spark output\|CHUNK.*FAILURES" "$LOG" | tee -a "$LOG"
