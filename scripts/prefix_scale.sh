#!/bin/bash
# Prefix-size curves for the maintenance family (VERDICT r12 directive #6):
# merge cost at FIXED batch size with 1x (sf0.01-built) vs 10x (sf0.1-built)
# prefix artifacts. Run on an idle machine; merges into scaling_curves.json.
set -e
# strip sbt's [info] prefix — keep from the JSON brace on
SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.PrefixScale' 2>/dev/null \
  | grep -o '{"metric":"prefix_scale".*' | tail -1 > /tmp/prefix_scale.json
python3 - <<'EOF'
import json
cur = json.load(open('scaling_curves.json'))
cur['prefix_curves'] = json.load(open('/tmp/prefix_scale.json'))
json.dump(cur, open('scaling_curves.json', 'w'), indent=1)
print(cur['prefix_curves'])
EOF
