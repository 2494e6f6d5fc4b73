"""NoisyNet linear layer (functional, explicit-noise).

Counterpart of the reference ``NoisyLinear`` (scripts/ranbowdqn.py:440-496):
mu/sigma parameters plus Gaussian noise buffers with the
``sign(x)*sqrt(|x|)`` scaling.  Torch hides the noise in module buffers
mutated by ``reset_noise``; here noise is explicit data -- sampled into a
PyTree by :func:`noisy_sample_noise` and passed to apply -- which makes the
layer pure, vmap-able across batched learners, and reproducible from PRNG
keys alone.  Passing ``noise=None`` gives the eval-mode (mu-only) path
(ranbowdqn.py:468-473).
"""

import math

import jax
import jax.numpy as jnp


def noisy_init(key, in_features, out_features, std_init=0.4, dtype=jnp.float32):
    """Parameter init per ranbowdqn.py:477-484."""
    kw, kb = jax.random.split(key)
    mu_range = 1.0 / math.sqrt(in_features)
    return {
        "w_mu": jax.random.uniform(kw, (in_features, out_features), dtype,
                                   -mu_range, mu_range),
        "w_sigma": jnp.full((in_features, out_features),
                            std_init / math.sqrt(in_features), dtype),
        "b_mu": jax.random.uniform(kb, (out_features,), dtype,
                                   -mu_range, mu_range),
        "b_sigma": jnp.full((out_features,),
                            std_init / math.sqrt(out_features), dtype),
    }


def _scale_noise(key, size, dtype):
    """sign(x) * sqrt(|x|) of a standard normal (ranbowdqn.py:493-496)."""
    x = jax.random.normal(key, (size,), dtype)
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


def noisy_sample_noise(key, in_features, out_features, dtype=jnp.float32):
    """Factorised noise: eps_w = outer(eps_in, eps_out), eps_b = eps_out'
    (ranbowdqn.py:486-491 -- note the reference draws an independent
    vector for the bias)."""
    k_in, k_out, k_b = jax.random.split(key, 3)
    eps_in = _scale_noise(k_in, in_features, dtype)
    eps_out = _scale_noise(k_out, out_features, dtype)
    return {
        "w_eps": jnp.outer(eps_in, eps_out),
        "b_eps": _scale_noise(k_b, out_features, dtype),
    }


def noisy_apply(params, x, noise=None):
    """Linear layer with (optionally) noisy weights (ranbowdqn.py:460-475)."""
    if noise is None:
        w, b = params["w_mu"], params["b_mu"]
    else:
        w = params["w_mu"] + params["w_sigma"] * noise["w_eps"]
        b = params["b_mu"] + params["b_sigma"] * noise["b_eps"]
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype) + b
