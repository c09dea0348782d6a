#!/bin/bash
# two-phase protocol (ref parity: experiments/geotransformer.kitti.../eval.sh):
# dump features with test.py, then offline-eval with LGR
set -e
SNAPSHOT=${1:-epoch-160}
python "$(dirname "$0")/test.py" --snapshot "$SNAPSHOT"
python "$(dirname "$0")/eval.py" --method lgr --verbose
