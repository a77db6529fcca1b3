#!/bin/bash
# Multi-process distributed tests on CPU devices (no pod hardware needed):
#  1. 2-process smoke: multi-host init + cross-process collectives.
#  2. 2-process mini-train: the REAL Trainer over a 2-process 'data' mesh
#     must reproduce the single-process per-step loss trajectory (same
#     global batches via sharded loader striding).
set -e
cd "$(dirname "$0")/.."
PORT=${1:-12355}

python tools/mp_worker.py 1 2 "$PORT" &
W1=$!
python tools/mp_worker.py 0 2 "$PORT"
wait $W1
echo "multi-process smoke PASSED"

OUT=$(mktemp -d)
python tools/mp_train_worker.py 0 1 "$PORT" "$OUT/single"
PORT2=$((PORT + 1))
python tools/mp_train_worker.py 1 2 "$PORT2" "$OUT/multi" &
W1=$!
python tools/mp_train_worker.py 0 2 "$PORT2" "$OUT/multi"
wait $W1

python - "$OUT" <<'EOF'
import json, sys

def losses(path):
    rows = [json.loads(l) for l in open(path)]
    return {r["step"]: r["loss"] for r in rows if "loss" in r}

single = losses(sys.argv[1] + "/single/tiny.jsonl")
multi = losses(sys.argv[1] + "/multi/tiny.jsonl")
assert single and set(single) == set(multi), (sorted(single), sorted(multi))
for step in sorted(single):
    a, b = single[step], multi[step]
    assert abs(a - b) <= 1e-4 * max(abs(a), abs(b)), (step, a, b)
print(f"loss trajectories match over {len(single)} steps: "
      f"{[round(single[s], 3) for s in sorted(single)]}")
EOF
echo "multi-process mini-train PASSED"
