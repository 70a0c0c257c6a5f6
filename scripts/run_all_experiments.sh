#!/usr/bin/env bash
# Run every experiment manifest through the driver (reference
# scripts/run_all_experiments.sh role).
set -euo pipefail
cd "$(dirname "$0")/.."
for m in configs/experiments/*.yaml; do
  echo "=== $m ==="
  python scripts/run_experiment.py "$m" "$@"
done
python scripts/analyze_experiments.py
