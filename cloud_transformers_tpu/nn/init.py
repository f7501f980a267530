"""PyTorch-compatible parameter initializers.

The reference relies on torch defaults (kaiming_uniform with a=sqrt(5) for
conv/linear kernels, i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)), and the same
bound for biases).  Matching them keeps training dynamics comparable for
accuracy-parity runs.
"""

import jax.numpy as jnp
from jax import nn as jnn
from jax import random


def torch_kernel_init():
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Conv/Linear default.

    variance_scaling with scale 1/3, fan_in, uniform gives exactly
    limit = sqrt(3 * (1/3) / fan_in) = 1/sqrt(fan_in).
    """
    return jnn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Conv/Linear bias default."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init
