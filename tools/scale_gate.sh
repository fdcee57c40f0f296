#!/bin/bash
# Dev-only scale-gate runner (r10 VERDICT #1/#5/#6 → SCALE_GATE_r11).
# Usage:
#   tools/scale_gate.sh distinct   # 64x distinct-payload arm, stage-adjudicated
#   tools/scale_gate.sh verbatim   # 128x verbatim arm, full inventory, chunked
# Inputs are built once by graft.tools.ScaleUp:
#   target/distinct64  (64x,  distinct mode)
#   target/scaleup128  (128x, verbatim)
set -euo pipefail
cd "$(dirname "$0")/.."

# The r10 distinct arm's 32 similarity/ANN/vocab faces + the r10 VERDICT
# item-6 extension (span/chunk/boilerplate/contamination dedup family,
# whose shuffles are token-position-sized — the axis that multiplies
# distinct spans is exactly their stressor).
DISTINCT_FACES="q_ann_ivf,q_ann_lsh,q_ann_recall,q_ann_refine,q_ann_topk,\
q_dedup_clusters,q_dedup_embedding,q_dedup_exact,q_dedup_fuzzy,\
q_dedup_keep_best,q_dedup_minhash,q_dedup_semantic,q_dedup_simhash,\
q_distinctive_terms,q_dup_rate,q_embed_cov,q_embed_prdim,q_heavy_hitters,\
q_ivf_rebalance,q_ivf_stats,q_knn_join,q_lsh_recall,q_lsh_tuning,\
q_ngram_containment,q_ngram_jaccard,q_pmi,q_setsim_prefix,q_vocab,\
q_vocab_approx,q_vocab_overlap,q_weighted_sample,q_zipf,\
q_span_dedup,q_span_dedup_fast,q_chunk_dedup,q_boilerplate,\
q_contamination_ngram,q_contamination"

case "${1:?arm}" in
  distinct)
    SPARK_GRAFT_DUMP_PARTS=1 SPARK_GRAFT_DUMP_STAGES=1 \
      SPARK_GRAFT_ONLY="$DISTINCT_FACES" \
      tools/runjvm.sh graft.Verify target/distinct64 target/verify_distinct64
    # q_vocab_approx adjudication is excluded by oracle precondition
    # (r10 gate, annotated): the exact-count oracle is valid only while
    # |vocab| <= the 64 MG counters; distinct-64x multiplies the
    # vocabulary past that by design, entering the overflow regime whose
    # no-miss guarantee is pinned by the FreqAgg property spec. The face
    # still dumps (rows+schema recorded via EXCLUDED).
    python3 tools/oracle_check.py target/verify_distinct64 target/distinct64 \
      --timeout 240 --scale-oracles --stage-oracles --skip q_vocab_approx
    ;;
  verbatim)
    SPARK_GRAFT_DUMP_PARTS=1 \
      tools/runjvm.sh graft.Verify target/scaleup128 target/verify128
    # chunk the 244-face adjudication across 3 checker processes (the
    # r10 cadence); keys assigned by sorted-order modulus for balance
    python3 - <<'EOF'
import json, subprocess, sys
oracle = json.load(open("target/verify128/oracle_sql.json"))
keys = sorted(oracle)
chunks = [",".join(keys[i::3]) for i in range(3)]
procs = [subprocess.Popen(
    ["python3", "tools/oracle_check.py", "target/verify128",
     "target/scaleup128", "--timeout", "240", "--scale-oracles",
     "--only", c],
    stdout=open(f"target/verify128/check_chunk{i}.log", "w"),
    stderr=subprocess.STDOUT)
    for i, c in enumerate(chunks)]
rc = max(p.wait() for p in procs)
for i in range(3):
    sys.stdout.write(open(f"target/verify128/check_chunk{i}.log").read())
sys.exit(rc)
EOF
    ;;
  *) echo "unknown arm: $1" >&2; exit 2 ;;
esac
