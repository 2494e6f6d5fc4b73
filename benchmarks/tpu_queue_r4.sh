#!/bin/bash
# Round-4 serialized TPU job queue (ONE process holds the chip at a time):
#   1. repo-side faithful Rainbow seeds 3..9 at 200 episodes (the matched
#      half of the torch-parity statistical-power upgrade) + aggregate;
#   2. faithful Rainbow at the reference's 4,000-episode scale, 3 seeds.
# Each job runs in its own process under a GENEROUS timeout (a timeout-kill
# mid-execution strands the chip grant), and exit status is checked per job.
set -u
cd /root/repo
OUT=docs/parity/rainbow_seeds
mkdir -p "$OUT" docs/parity/rainbow_4000
for s in 3 4 5 6 7 8 9; do
  if [ -s "$OUT/seed$s.json" ]; then echo "repo seed $s done"; continue; fi
  timeout 3600 python examples/parity_rainbow.py --summary-only \
    --seed "$s" --episodes 200 --out "$OUT/seed$s" \
    > "$OUT/seed$s.log" 2>&1
  echo "repo seed $s exit $?"
done
# Merge the original 3 seeds (stored in rainbow_seed_variance.json) with
# the new ones and re-aggregate.
python - <<'EOF'
import json, os
doc = json.load(open('docs/parity/rainbow_seed_variance.json'))
os.makedirs('docs/parity/rainbow_seeds', exist_ok=True)
for r in doc['runs']:
    p = f"docs/parity/rainbow_seeds/seed{r['seed']}.json"
    if not os.path.exists(p):
        json.dump(r, open(p, 'w'), indent=1)
EOF
python examples/parity_rainbow.py --aggregate "docs/parity/rainbow_seeds/seed*.json" \
  --out docs/parity/rainbow_seed_variance.json
echo "repo aggregate exit $?"

for s in 0 1 2; do
  d=docs/parity/rainbow_4000/seed$s
  if [ -s "$d.json" ]; then echo "4000-ep seed $s done"; continue; fi
  timeout 14000 python examples/parity_rainbow.py --summary-only \
    --seed "$s" --episodes 4000 --max-chunks 5000 --out "$d" \
    > "$d.log" 2>&1
  echo "4000-ep seed $s exit $?"
done
echo "QUEUE DONE"
