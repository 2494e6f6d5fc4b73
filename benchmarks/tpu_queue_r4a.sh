#!/bin/bash
# Round-4 TPU queue, part A (serialized; one chip holder at a time):
#   1. DR_L1: fused-DRQN training vs frozen DR_L0 (the recurrent ladder
#      rung VERDICT r3 item 6 asks for);
#   2. finalize it into model_zoo/DR_L1;
#   3. rebuild league.json over the full zoo incl. the six REF_* imports
#      and DR_L1.
set -u
cd /root/repo
LOG=docs/parity/r4_queue_a.log
: > "$LOG"

if [ ! -s model_zoo/DR_L1/params.npz ]; then
  timeout 3600 python -m merging_gym_tpu.cli train --algo drqn --fused-kernel \
    --opponent model_zoo/DR_L0/params.npz --num-envs 1024 --learn-batch 128 \
    --episodes 20000 --chunk-steps 2000 --max-chunks 50 --seed 1 \
    --out /tmp/dr_l1_run >> "$LOG" 2>&1
  echo "train DR_L1 exit $?" | tee -a "$LOG"
  timeout 3600 python model_zoo/add_drqn_entry.py --run /tmp/dr_l1_run \
    --name DR_L1 --vs model_zoo/L1/params.npz \
    --note "Second recurrent rung: fused-DRQN kernel (ops/fused_drqn.py) vs frozen DR_L0, 1024 envs, learn_batch 128, seq_len 16." \
    >> "$LOG" 2>&1
  echo "add DR_L1 exit $?" | tee -a "$LOG"
fi

timeout 7200 python model_zoo/make_league.py >> "$LOG" 2>&1
echo "league exit $?" | tee -a "$LOG"
echo "QUEUE A DONE"
