"""Import the reference's six pretrained DQN checkpoints as zoo entries.

/root/reference/test_params/dqn holds the only ground-truth BEHAVIORAL
artifacts the reference published -- six trained runs (the policies its
human study loaded, human_player.py:59-73), named by the convention
``<timestamp>normal dqn[ with OP:<rung>](<reward tuple>)``.  This
script imports each ``eval.pth`` through io.torch_import (the tested
.pth interop path, tests/test_io.py) into ``model_zoo/REF_*`` entries
so they become league citizens: head-to-head REF-vs-repo rows are the
strongest cross-implementation behavior check available without the
reference's training stack (VERDICT r3, missing item 1).

Naming: an agent trained vs OP:Lk is a level-(k+1) policy, so the two
OP:L0 runs become REF_L1_A/B, the two OP:L1 runs REF_L2_A/B, the OP:L2
run REF_L3, and the no-OP run with the (2.0, 1.0, -10, 0.01) reward
tuple (10x vel_penalty) REF_VP001.

    python model_zoo/add_reference_entries.py [--ref /root/reference]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ZOO = os.path.dirname(os.path.abspath(__file__))

# dir-name fragment -> (entry name, trained-vs opponent, reward tuple)
RUNS = [
    ("2022--03--30 18:48:33normal dqn(2.0, 1.0, -10, 0.01)",
     "REF_VP001", None, (2.0, 1.0, -10.0, 0.01)),
    ("2022--03--31 03:37:35normal dqn with OP:L0(2.0, 1.0, -10, 0.001)",
     "REF_L1_A", "L0", (2.0, 1.0, -10.0, 0.001)),
    ("2022--03--31 20:37:39normal dqn with OP:L0(2.0, 1.0, -10, 0.001)",
     "REF_L1_B", "L0", (2.0, 1.0, -10.0, 0.001)),
    ("2022--03--31 14:45:59normal dqn with OP:L1(2.0, 1.0, -10, 0.001)",
     "REF_L2_A", "L1", (2.0, 1.0, -10.0, 0.001)),
    ("2022--03--31 21:36:59normal dqn with OP:L1(2.0, 1.0, -10, 0.001)",
     "REF_L2_B", "L1", (2.0, 1.0, -10.0, 0.001)),
    ("2022--03--31 21:33:10normal dqn with OP:L2(2.0, 1.0, -10, 0.001)",
     "REF_L3", "L2", (2.0, 1.0, -10.0, 0.001)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    args = ap.parse_args()

    from merging_gym_tpu.io.checkpoint import save_params_npz
    from merging_gym_tpu.io.torch_import import load_qnet_pth

    base = os.path.join(args.ref, "test_params", "dqn")
    for dirname, name, opp, rt in RUNS:
        run = os.path.join(base, dirname)
        params = load_qnet_pth(os.path.join(run, "eval.pth"))
        out = os.path.join(ZOO, name)
        os.makedirs(out, exist_ok=True)
        save_params_npz(os.path.join(out, "params.npz"), params)
        meta = {
            "algo": "dqn",
            "source": "reference checkpoint (torch eval.pth imported via "
                      "io.torch_import.load_qnet_pth)",
            "reference_dir": f"test_params/dqn/{dirname}",
            "trained_vs": opp,
            "reward_tuple": list(rt),
            "note": "One of the six pretrained policies the reference's "
                    "human study played against (human_player.py:59-73); "
                    "imported unmodified for cross-implementation "
                    "head-to-head league rows.",
        }
        with open(os.path.join(out, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        print(f"imported {name} <- {dirname}")


if __name__ == "__main__":
    main()
