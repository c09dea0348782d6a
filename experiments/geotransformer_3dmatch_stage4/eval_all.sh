#!/bin/bash
# epoch sweep (ref parity: eval_all.sh sweeps epochs 20-40)
set -e
BENCHMARK=${1:-3DMatch}
for epoch in $(seq 20 40); do
  echo "=== epoch-$epoch ==="
  python "$(dirname "$0")/test.py" --snapshot "epoch-$epoch" --benchmark "$BENCHMARK"
  python "$(dirname "$0")/eval.py" --benchmark "$BENCHMARK" --method lgr
done
