#!/bin/bash
# 2-process distributed smoke test: multi-host init + cross-process
# collectives on CPU devices (no pod hardware needed).
set -e
cd "$(dirname "$0")/.."
PORT=${1:-12355}
python tools/mp_worker.py 1 2 "$PORT" &
W1=$!
python tools/mp_worker.py 0 2 "$PORT"
wait $W1
echo "multi-process distributed test PASSED"
