"""Parameter initializers with torch-equivalent distributions.

The reference relies on torch defaults (nn.Linear: kaiming-uniform a=sqrt(5);
heads: xavier, vit_face.py:31,98,169,245; loralib: lora_A kaiming-uniform
a=sqrt(5), lora_B zeros; reinit between CL tasks uses a=sqrt(50),
util/utils.py:428-441).  We reproduce the *distributions* (bounds/std), not
torch's RNG stream.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_in_out(shape) -> tuple[int, int]:
    # torch convention for 2D weight (out, in): fan_in = shape[1].
    if len(shape) < 2:
        return shape[0], shape[0]
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    return fan_in, fan_out


def kaiming_uniform(key, shape, a: float = math.sqrt(5), dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ with leaky_relu gain."""
    fan_in, _ = _fan_in_out(shape)
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def lecun_linear_bias(key, fan_in: int, shape, dtype=jnp.float32):
    """torch nn.Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    fan_in, fan_out = _fan_in_out(shape)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_normal(key, shape, gain: float = 1.0, dtype=jnp.float32):
    fan_in, fan_out = _fan_in_out(shape)
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)
