"""Normalization layers: instance norm + AdaIN conditioning.

Reference: /root/reference/layers/utils.py:82-97 (``AdaIn1dUpd``).

BatchNorm itself comes straight from ``flax.linen.BatchNorm``: under pjit with
the batch axis sharded over the mesh, XLA computes global batch statistics and
inserts the collectives itself, so the reference's
``SyncBatchNorm.convert_sync_batchnorm`` (train_classification.py:107-109) is
the *default* behavior here, not an opt-in wrapper.  Torch parity: momentum 0.1
-> flax momentum 0.9, eps 1e-5.
"""

import flax.linen as nn
import jax.numpy as jnp

from cloud_transformers_tpu.nn.init import torch_kernel_init, torch_bias_init


def instance_norm_1d(x, eps=1e-5):
    """InstanceNorm over the point axis of ``[B, P, C]``, no affine params.

    Matches ``torch.nn.InstanceNorm1d(affine=False)`` (biased variance, always
    instance statistics in both train and eval).
    """
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))


class AdaIn1d(nn.Module):
    """Adaptive instance norm: instance-normalize then per-channel affine from
    a latent code (utils.py:82-97: ``x * (scale + 1) + bias``).

    Call: ``AdaIn1d(features)(x, z)`` with x ``[B, P, C]``, z ``[B, L]``.
    """

    features: int

    @nn.compact
    def __call__(self, x, z):
        x = instance_norm_1d(x)
        fan_in = z.shape[-1]
        var_bias = nn.Dense(self.features * 2,
                            kernel_init=torch_kernel_init(),
                            bias_init=torch_bias_init(fan_in))(z)
        scale = var_bias[:, : self.features]
        bias = var_bias[:, self.features:]
        return x * (scale[:, None, :] + 1.0) + bias[:, None, :]
