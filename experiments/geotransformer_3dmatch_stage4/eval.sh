#!/bin/bash
# two-phase protocol (ref parity: eval.sh): dump features then offline-eval
set -e
SNAPSHOT=${1:-epoch-40}
BENCHMARK=${2:-3DMatch}
python "$(dirname "$0")/test.py" --snapshot "$SNAPSHOT" --benchmark "$BENCHMARK"
python "$(dirname "$0")/eval.py" --benchmark "$BENCHMARK" --method lgr --verbose
