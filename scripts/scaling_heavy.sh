#!/bin/bash
# 3-SF scaling curves for the heavy board entries (VERDICT r11 directive #3).
# Run on an idle machine; merges results into scaling_curves.json.
set -e
QS=${QS:-graph_modularity,graph_hits,dedup_pipeline_shared,dedup_stream_novelty,dedup_clusters,dedup_prefix_join,dedup_cluster_maintenance}
for SF in 0.001 0.01 0.1; do
  # a stale target + a warm loadavg would trip Bench's no-clobber
  # diversion (board hygiene, round 13) — these are throwaway files
  rm -f /tmp/scale_$SF.json /tmp/scale_$SF.json.contaminated
  SPARK_GRAFT_SF_DIR=/root/testdata/sf$SF SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY=$QS SPARK_GRAFT_BENCH_OUT=/tmp/scale_$SF.json \
    sbt -batch 'runMain graft.Bench' > /dev/null 2>&1
  echo "sf$SF done"
done
python3 - <<'EOF'
import json
cur = json.load(open('scaling_curves.json'))
sfs = ['0.001', '0.01', '0.1']
runs = {sf: json.load(open(f'/tmp/scale_{sf}.json')) for sf in sfs}
for q in runs['0.1']['queries']:
    row = {f'sf{sf}': runs[sf]['queries'][q] for sf in sfs}
    row['ratio_10x'] = round(runs['0.1']['queries'][q] / runs['0.01']['queries'][q], 2)
    cur['queries'][q] = row
json.dump(cur, open('scaling_curves.json', 'w'), indent=1)
print({q: cur['queries'][q]['ratio_10x'] for q in runs['0.1']['queries']})
EOF
