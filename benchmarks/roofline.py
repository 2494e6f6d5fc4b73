"""Counted-FLOPs / bytes-moved roofline for every headline kernel row.

VERDICT r3 item 4: the benchmark tables report env-steps/s; this module
derives, per headline row, the arithmetic and memory cost of ONE env
step from static counts of the kernel's program (not profiler output --
the kernels are single Mosaic programs, so the per-step op inventory is
exact up to compiler fusion), then converts the MEASURED rates
(docs/BENCHMARKS.md, medians on the real chip) into utilization of each
chip resource and names the binding one.

Chip model (TPU v5e, one TensorCore), with sources:
  * MXU: 197 TFLOP/s bf16 nominal; f32 matmul peak measured in-repo at
    ~90 TFLOP/s from counted FLOPs of the widest XLA trainer
    (docs/BENCHMARKS.md "Width / precision scaling").  We rate MXU rows
    against the 90 TFLOP/s measured f32 ceiling.
  * HBM: 819 GB/s nominal.
  * VPU: 4 ALUs x (8, 128) f32 lanes per cycle at ~1.5 GHz (clock
    implied by 197e12 / (4 MXUs * 128*128 MACs * 2)) = ~6.1 T
    lane-ops/s.  Transcendentals (sin/cos/exp/tanh/sigmoid) are counted
    at ~8 lane-op slots each (lookup+polynomial), the dominant
    correction confirmed by the stub experiment (trig = 11% of the
    rollout step, docs/BENCHMARKS.md "Speed-of-light analysis").
  * Dispatch: ~25 ms per launch on this tunneled runtime
    (benchmarks/launch_length_sweep.py), amortized over the steps in
    one launch.

All per-step counts are per GRID step (all lanes), f32.  MAC = 2 FLOPs.

    python benchmarks/roofline.py          # prints the markdown table
"""

import json

# Historical denominator for these rows (kept so the table stays
# comparable across rounds).  Round 5's mxu_peak_probe.py showed this is
# an XLA end-to-end number, not a hardware peak: DEFAULT-precision f32
# dots already run bf16 multiplies, and Pallas kernels with resident
# weights sustain 151 TFLOP/s -- the fused width study
# (fused_width_dtype.py) therefore uses the 197e12 nominal ceiling.
MXU_F32 = 90e12
HBM = 819e9              # nominal bytes/s
VPU = 6.1e12             # lane-ops/s (derived above)
DISPATCH = 0.025         # s per launch


def mlp_flops(widths):
    """MACs*2 through a dense chain [in, h1, ..., out], per lane."""
    return 2 * sum(a * b for a, b in zip(widths[:-1], widths[1:]))


# Per-lane vector-op inventories (lane-ops, transcendentals pre-weighted
# x8), counted from the kernel sources:
#   _env_step_math (ops/fused_rollout.py): dynamics 10, winner machine /
#   rewards ~40, timeout/done 6, collision rounded-AABB ~30, obs build
#   10, lon2coord 2 lanes x (sin+cos -> 16 slots) + 6 muls = ~38 on
#   reset path (amortized ~1/45 episodes -> counted at 1), penalties 8.
ENV_STEP_VOPS = 110
#   PRNG draw + threshold compare + modulo per actor seat.
ACTOR_RNG_VOPS = 12
#   LSTM cell elementwise: 3 sigmoid + 2 tanh (x8) + 6 mul/add.
LSTM_ELEM_VOPS = 5 * 8 + 6

ROWS = []


def row(name, rate, *, flops=0.0, vops=0.0, bytes_=0.0, lanes, launch,
        scan_floor=False, binding=None, note=""):
    """One headline row: measured env-steps/s -> resource utilizations.

    ``flops``/``vops``/``bytes_`` are per GRID step; ``rate`` is
    env-steps/s over ``lanes`` lanes; ``launch`` is steps per launch of
    a Pallas kernel, or -- with ``scan_floor`` -- the row is an XLA scan
    whose per-ITERATION runtime floor (~60 us, measured in
    docs/BENCHMARKS.md round 1) replaces per-launch dispatch.

    ``binding`` overrides the max-utilization pick where a measurement
    (stub experiment, launch-length sweep) disambiguates better than the
    analytic model -- the VPU inventory in particular is an idealized
    issue-rate bound; real per-op cost on [1, n]-row shapes includes
    Mosaic sublane packing and dependency stalls the count ignores, so
    VPU percentages are lower bounds on true VPU occupancy.
    """
    grid_rate = rate / lanes
    util = {
        "MXU": grid_rate * flops / MXU_F32,
        "HBM": grid_rate * bytes_ / HBM,
        "VPU": grid_rate * vops / VPU,
    }
    if scan_floor:
        util["scan-floor"] = grid_rate * 60e-6
    else:
        util["dispatch"] = grid_rate * DISPATCH / launch
    pick = binding or max(util, key=util.get)
    ROWS.append({
        "row": name, "env_steps_per_s": rate,
        "flops_per_step": flops, "vops_per_step": vops,
        "bytes_per_step": bytes_,
        "us_per_grid_step": round(1e6 / grid_rate, 2),
        "util": {k: round(v, 4) for k, v in util.items()},
        "binding": pick,
        "note": note,
    })


def main():
    # ---- fused random-policy rollout (headline bench.py config) ----------
    n = 4096
    row("fused rollout 4,096 envs x 20,480-step", 1.17e9,
        vops=(ENV_STEP_VOPS + 8) * n,          # env + PRNG policy draw
        bytes_=60 * n,                          # full-trajectory writes
        lanes=n, launch=20480, binding="dispatch+VPU",
        note="the launch-length sweep (72M at 512 steps -> 1.10B at "
             "16,384) fits T_launch = 25 ms + steps * 2.2 us exactly: "
             "41% of the headline launch is still dispatch, the rest "
             "VPU-side step compute (trig alone is 11% by the stub "
             "experiment); HBM writes (0.30 us/step) hide under it")

    # ---- fused learned-policy rollout ------------------------------------
    q = mlp_flops([10, 200, 100, 5])
    row("fused policy rollout 4,096 envs x 16,384-step (selfplay)", 478e6,
        flops=2 * q * n,                        # both seats' Q-net fwd
        vops=(ENV_STEP_VOPS + 2 * ACTOR_RNG_VOPS + 30) * n,
        bytes_=60 * n,
        lanes=n, launch=16384,
        note="two 23K-param Q-net forwards per step lift arithmetic "
             "intensity; MXU still cold at this width")

    # ---- fused DQN trainer ----------------------------------------------
    for envs, B, rate, launch, label in (
            (4096, 4096, 110e6, 8192, "full-slab batch"),
            (16384, 4096, 127e6, 4096, "full-slab batch"),
            (4096, 128, 160e6, 8192, "learn_batch 128"),
            (16384, 128, 237e6, 4096, "learn_batch 128")):
        actor = 2 * q * envs
        learner = 5 * q * B                     # eval(x), eval(xn), tp(xn), bwd~2x
        adam = 10 * 23005                       # m/v/update per param
        ring = (24 * 4 + 24 * 4) * envs         # slab write + sampled read
        row(f"fused DQN trainer {envs:,} envs ({label}, {launch}-step)",
            rate, flops=actor + learner,
            vops=(ENV_STEP_VOPS + 2 * ACTOR_RNG_VOPS) * envs + adam,
            bytes_=0,                           # ring stays in VMEM
            lanes=envs, launch=launch,
            note="all state VMEM-resident; no HBM traffic inside a launch")
        _ = ring

    # ---- fused DRQN trainer (round 4) -----------------------------------
    dr = 2 * (10 * 200 + 200 * 16 + 2 * 16 * 64 + 16 * 16 + 16 * 5)
    L = 16
    for envs, B, rate in ((1024, 128, 19.6e6), (4096, 128, 67.6e6)):
        actor = 2 * dr * envs + 2 * LSTM_ELEM_VOPS * envs
        learner = (L + 1) * 4 * dr * B          # eval fwd + target fwd + bwd~2x
        adam = 10 * 23317
        row(f"fused DRQN trainer {envs:,} envs (learn_batch {B}, "
            "4,096-step)",
            rate, flops=actor + learner,
            vops=(ENV_STEP_VOPS + 2 * ACTOR_RNG_VOPS
                  + 2 * LSTM_ELEM_VOPS) * envs
                 + (L + 1) * 3 * LSTM_ELEM_VOPS * B + adam,
            bytes_=0, lanes=envs, launch=4096, binding="matmul latency",
            note="after batching every timestep-independent matmul over "
                 "the unroll (one [rows, 17B] issue each), only the 33 "
                 "sequential whh issues remain; the round-4b follow-up "
                 "(fusing eval+target chains block-diagonally, 50 -> 33 "
                 "deep) measured FLAT, so the floor is the recurrence "
                 "chain + fixed per-step machinery, not issue count; "
                 "the width sweep (benchmarks/drqn_width.py) confirms "
                 "wider LSTMs raise MXU occupancy to 47% at ~flat wall "
                 "time")

    # ---- fused HDQN trainer ---------------------------------------------
    lo = mlp_flops([11, 200, 100, 5])
    up = mlp_flops([10, 200, 100, 8])
    envs = 1024
    row(f"fused HDQN trainer {envs:,} envs (full slab, 16,384-step)", 47.2e6,
        flops=(2 * lo + up) * envs + 5 * (lo + up) * envs,
        vops=(ENV_STEP_VOPS + 3 * ACTOR_RNG_VOPS + 60) * envs + 2 * 10 * 25000,
        bytes_=0, lanes=envs, launch=16384,
        note="two learners per step; same small-matmul regime as DQN; "
             "16,384-step launches lift the 2,000-step 25.5M row by 85% "
             "exactly as the dispatch share predicted")
    envs, B = 4096, 128
    row(f"fused HDQN trainer {envs:,} envs (learn_batch {B}, "
        "16,384-step)", 128.4e6,
        flops=(2 * lo + up) * envs + 5 * (lo + up) * B,
        vops=(ENV_STEP_VOPS + 3 * ACTOR_RNG_VOPS + 60) * envs + 2 * 10 * 25000,
        bytes_=0, lanes=envs, launch=16384,
        note="selfplay; lane-window learners at reference batch scale")

    # ---- fused Rainbow trainer ------------------------------------------
    rb = 2 * (10 * 32 + 32 * 64 + 64 * 64 + 64 * 51 + 64 * 64 + 64 * 5 * 51)
    envs, B = 4096, 128
    row(f"fused Rainbow PER+3-step {envs:,} envs (learn_batch {B}, "
        "16,384-step)", 77.9e6,
        flops=2 * rb * envs + 5 * rb * B,
        vops=(ENV_STEP_VOPS + 2 * ACTOR_RNG_VOPS + 2 * 51 * 10) * envs
             + (2 * 51 * 64 + 51 * 51 * 3) * B,   # softmax x heads + projection
        bytes_=0, lanes=envs, launch=16384,
        note="C51 projection is a [51,51] hat-matrix matmul per learn "
             "plus per-lane softmaxes; VPU transcendentals dominate")

    # ---- XLA vectorized rollout (for contrast) ---------------------------
    n = 4096
    row("XLA rollout 4,096 envs (full trajectories)", 64e6,
        vops=(ENV_STEP_VOPS + 8) * n, bytes_=60 * n + 200 * n,
        lanes=n, launch=1, scan_floor=True,
        note="per-scan-iteration runtime floor (~60 us) takes 94% of "
             "the step; neither FLOPs nor HBM bind -- the whole reason "
             "the fused kernels exist")

    print("| row | env-steps/s | TFLOP/s | MXU | HBM | VPU | dispatch "
          "| binding |")
    print("|---|---|---|---|---|---|---|---|")
    for r in ROWS:
        u = r["util"]
        # util['MXU'] is achieved/peak, so achieved FLOP/s = util * peak.
        last = (f"{u['dispatch']*100:.1f}%" if "dispatch" in u
                else f"(scan floor {u['scan-floor']*100:.0f}%)")
        print(f"| {r['row']} | {r['env_steps_per_s']/1e6:.0f}M "
              f"| {u['MXU']*MXU_F32/1e12:.2f} "
              f"| {u['MXU']*100:.1f}% | {u['HBM']*100:.1f}% "
              f"| {u['VPU']*100:.1f}% | {last} "
              f"| **{r['binding']}** |")
    print()
    print(json.dumps(ROWS, indent=1))


if __name__ == "__main__":
    main()
