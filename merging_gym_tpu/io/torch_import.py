"""Torch checkpoint interop: .pth state_dicts <-> param PyTrees.

Lets this framework load the six pretrained reference DQN checkpoints
shipped in ``test_params/dqn/*`` (eval.pth/target.pth, saved by
scripts/main.py:244-245) and play against them, and export its own
params back to .pth for reference-side tooling.

Torch ``nn.Linear`` stores ``weight`` as [out, in]; our dense layers
store ``w`` as [in, out], so weights transpose on the way through.
Gated on torch availability -- torch is never imported on the hot path.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

# Reference Q-net layer names (main.py:34-38) -> our layer indices.
_QNET_LAYERS = ["fc1", "fc2", "out"]
# Reference Rainbow module names (ranbowdqn.py:508-515) map 1:1 to ours.
_RAINBOW_DENSE = ["linear1", "linear2"]
_RAINBOW_NOISY = ["noisy_value1", "noisy_value2",
                  "noisy_advantage1", "noisy_advantage2"]


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy())


def qnet_from_state_dict(state_dict, dtype=jnp.float32):
    """Torch ``Net`` state_dict -> qnet param PyTree (nn.mlp layout)."""
    params = {}
    for i, name in enumerate(_QNET_LAYERS):
        params[f"fc{i}"] = {
            "w": jnp.asarray(_to_np(state_dict[f"{name}.weight"]).T, dtype),
            "b": jnp.asarray(_to_np(state_dict[f"{name}.bias"]), dtype),
        }
    return params


def qnet_to_state_dict(params):
    """qnet param PyTree -> torch ``Net`` state_dict (for .pth export)."""
    import torch

    sd = {}
    for i, name in enumerate(_QNET_LAYERS):
        p = params[f"fc{i}"]
        sd[f"{name}.weight"] = torch.from_numpy(np.asarray(p["w"]).T.copy())
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())
    return sd


def load_qnet_pth(path, dtype=jnp.float32):
    """Load one .pth file (e.g. ``.../eval.pth``) into a qnet PyTree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return qnet_from_state_dict(sd, dtype)


def load_reference_dqn(run_dir, dtype=jnp.float32):
    """Load a reference DQN run dir (eval.pth + target.pth,
    main.py:85-87) -> (eval_params, target_params)."""
    return (load_qnet_pth(os.path.join(run_dir, "eval.pth"), dtype),
            load_qnet_pth(os.path.join(run_dir, "target.pth"), dtype))


def load_reference_hdqn(run_dir, dtype=jnp.float32):
    """Load a reference HDQN run dir (hdqn.py:69-71,152-154,362-366) ->
    dict with lower eval/target (11-in) and meta eval/target (3-out)."""
    return {
        "lower_eval": load_qnet_pth(os.path.join(run_dir, "eval.pth"), dtype),
        "lower_target": load_qnet_pth(os.path.join(run_dir, "target.pth"), dtype),
        "meta_eval": load_qnet_pth(os.path.join(run_dir, "meta_eval.pth"), dtype),
        "meta_target": load_qnet_pth(os.path.join(run_dir, "meta_target.pth"), dtype),
    }


def rainbow_from_state_dict(state_dict, dtype=jnp.float32):
    """Torch ``RainbowDQN`` state_dict -> rainbow param PyTree."""
    params = {}
    for name in _RAINBOW_DENSE:
        params[name] = {
            "w": jnp.asarray(_to_np(state_dict[f"{name}.weight"]).T, dtype),
            "b": jnp.asarray(_to_np(state_dict[f"{name}.bias"]), dtype),
        }
    for name in _RAINBOW_NOISY:
        params[name] = {
            "w_mu": jnp.asarray(_to_np(state_dict[f"{name}.weight_mu"]).T, dtype),
            "w_sigma": jnp.asarray(_to_np(state_dict[f"{name}.weight_sigma"]).T, dtype),
            "b_mu": jnp.asarray(_to_np(state_dict[f"{name}.bias_mu"]), dtype),
            "b_sigma": jnp.asarray(_to_np(state_dict[f"{name}.bias_sigma"]), dtype),
        }
    return params


def load_rainbow_pth(path, dtype=jnp.float32):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return rainbow_from_state_dict(sd, dtype)
