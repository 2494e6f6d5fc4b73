#!/bin/bash
# Round-5 statistical-power upgrade (VERDICT round 4, item 3): run the
# reference torch DQN and HDQN harnesses for seeds 3..7 (2000 episodes
# each, matching the existing seeds 0-2) so both parity JSONs reach n>=8,
# the bar the round-4 Rainbow upgrade set (torch_rainbow_batch.sh).
#
# Two nice'd single-threaded workers pull from one job queue, longest
# jobs (HDQN, ~55 min/seed) first so the makespan stays balanced on this
# 2-CPU machine.
set -u
cd /root/repo
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1
DOUT=docs/parity/torch_dqn_seeds
HOUT=docs/parity/torch_hdqn_seeds
mkdir -p "$DOUT" "$HOUT"

run_job() {
  local kind=$1 s=$2 out script
  if [ "$kind" = hdqn ]; then
    out="$HOUT/seed$s.json"; script=benchmarks/reference_torch_hdqn.py
  else
    out="$DOUT/seed$s.json"; script=benchmarks/reference_torch_dqn.py
  fi
  if [ -s "$out" ]; then echo "$kind seed $s already done"; return; fi
  nice -n 10 timeout 14400 python "$script" \
    --seed "$s" --episodes 2000 --out "$out" \
    > "${out%.json}.log" 2>&1
  echo "$kind seed $s exit $?"
}

JOBS=()
for s in 3 4 5 6 7; do JOBS+=("hdqn $s"); done
for s in 3 4 5 6 7; do JOBS+=("dqn $s"); done

for job in "${JOBS[@]}"; do
  run_job $job &
  while [ "$(jobs -rp | wc -l)" -ge 2 ]; do wait -n; done
done
wait
echo "ALL DONE"
