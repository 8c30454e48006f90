#!/bin/bash
# Interleaved r12-tree vs r13-tree A/B on the weak/borderline baseline
# rows (r13 verdict Next-round #1): glove50 hnsw/ivf_flat/ivf_pq,
# msmarco ivf_sq8. Alternating runs in the same session bracket box
# load; per-tree best-of-N adjudicates load vs code.
set -u
cd /root/repo
N=${1:-5}
for i in $(seq 1 "$N"); do
  for tree in r12 r13; do
    echo "=== iter $i tree $tree glove50 $(date +%H:%M:%S) ==="
    SPARK_GRAFT_BASELINE_DATASETS=glove50 \
      SPARK_GRAFT_BASELINE_ONLY=hnsw,ivf_flat,ivf_pq \
      GRAFT_CLASSES=/tmp/tree_${tree}/target/scala-2.13/classes \
      dev/java_run.sh graft.dev.BaselineShape 2>&1 | grep -Ev "WARN|INFO" | grep -E "hnsw|ivf_flat|ivf_pq|recall|qps" || true
    echo "=== iter $i tree $tree msmarco $(date +%H:%M:%S) ==="
    SPARK_GRAFT_BASELINE_DATASETS=msmarco \
      SPARK_GRAFT_BASELINE_ONLY=ivf_sq8 \
      GRAFT_CLASSES=/tmp/tree_${tree}/target/scala-2.13/classes \
      dev/java_run.sh graft.dev.BaselineShape 2>&1 | grep -Ev "WARN|INFO" | grep -E "ivf_sq8|recall|qps" || true
  done
done
echo "=== AB DONE ==="
