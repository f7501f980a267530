"""Normalization layers: instance norm + AdaIN conditioning.

Reference: /root/reference/layers/utils.py:82-97 (``AdaIn1dUpd``).

BatchNorm itself comes straight from ``flax.linen.BatchNorm``: under pjit with
the batch axis sharded over the mesh, XLA computes global batch statistics and
inserts the collectives itself, so the reference's
``SyncBatchNorm.convert_sync_batchnorm`` (train_classification.py:107-109) is
the *default* behavior here, not an opt-in wrapper.  Torch parity: momentum 0.1
-> flax momentum 0.9, eps 1e-5.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cloud_transformers_tpu.nn.init import torch_kernel_init, torch_bias_init


class BatchNorm(nn.Module):
    """BatchNorm with exact torch running-statistics semantics.

    (Class is named ``BatchNorm`` so flax's auto-generated module names —
    and therefore checkpoint / converter tree layouts — stay identical to
    the ``flax.linen.BatchNorm`` it replaces.  Import as ``TorchBatchNorm``.)

    ``flax.linen.BatchNorm`` stores the *biased* batch variance into the
    running average (flax normalization.py:404); torch normalizes with the
    biased variance but stores the *unbiased* one (Bessel ``n/(n-1)``,
    aten/src/ATen/native/Normalization.cpp).  The factor is a systematic
    (measurable: 1/256 ~ 4e-3 at the trunk's n) drift of eval-mode behavior
    from a torch-trained run, so this module reproduces torch exactly.

    Same parameter/variable names as ``flax.linen.BatchNorm`` (``scale``/
    ``bias`` params, ``mean``/``var`` in ``batch_stats``) — checkpoints and
    the torch converter interchange.  Under pjit with the batch axis sharded,
    the ``jnp.mean`` reductions are global, so SyncBatchNorm semantics
    (reference train_classification.py:107-109) remain the default.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", self.scale_init, (feat,))
        bias = self.param("bias", self.bias_init, (feat,))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x, axes)
            var = jnp.mean(jnp.square(x - mean), axes)  # biased (normalize)
            if not self.is_initializing():
                n = int(np.prod([x.shape[a] for a in axes]))
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * (var * bessel)

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (x - mean) * inv + bias


TorchBatchNorm = BatchNorm


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
