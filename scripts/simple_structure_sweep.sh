#!/usr/bin/env bash
# Aggregation/beta sweep for the simple_structure baseline — the
# reference's baselines/simple_structure.sh:1-8 grid on this framework's
# CLI. Usage: scripts/simple_structure_sweep.sh <dataset.pickle.bin>
set -euo pipefail
DATA="${1:?usage: simple_structure_sweep.sh <dataset.pickle.bin>}"
cd "$(dirname "$0")/.."
for agg in mean sum min max; do
  for beta in -0.1 0.1; do
    echo "=== agg=$agg beta=$beta ==="
    python -m taxoexpan_tpu.baselines.simple_structure \
      --data "$DATA" --agg "$agg" --beta "$beta"
  done
done
