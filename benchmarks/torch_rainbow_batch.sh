#!/bin/bash
# Run reference torch Rainbow seeds 3..9 (200 episodes each) two at a time,
# nice'd + single-threaded, writing per-seed JSONs for the round-4
# statistical-power upgrade (VERDICT round 3, item 3).
set -u
cd /root/repo
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1
OUT=docs/parity/torch_rainbow_seeds
mkdir -p "$OUT"
run_seed() {
  local s=$1
  if [ -s "$OUT/seed$s.json" ]; then echo "seed $s already done"; return; fi
  nice -n 10 timeout 10800 python benchmarks/reference_torch_rainbow.py \
    --seed "$s" --episodes 200 --out "$OUT/seed$s.json" \
    > "$OUT/seed$s.log" 2>&1
  echo "seed $s exit $?"
}
for s in 3 4 5 6 7 8 9; do
  run_seed "$s" &
  while [ "$(jobs -rp | wc -l)" -ge 2 ]; do wait -n; done
done
wait
echo "ALL DONE"
