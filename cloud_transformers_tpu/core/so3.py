"""SO(3) exponential map (Rodrigues' formula), pure JAX.

Replaces the pytorch3d ``so3_exponential_map`` dependency of the reference
(/root/reference/layers/utils.py:6,29,56), used for per-head learned rotations.
"""

import jax.numpy as jnp


def hat(v):
    """``[..., 3]`` axis vectors -> ``[..., 3, 3]`` skew-symmetric matrices."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exponential_map(log_rot, eps=1e-4):
    """``[..., 3]`` log-rotations -> ``[..., 3, 3]`` rotation matrices.

    R = I + sin(t)/t * K + (1 - cos(t))/t^2 * K^2  with K = hat(log_rot),
    t = |log_rot| clamped below by ``eps`` (same guard pytorch3d uses), which
    keeps the map and its gradient finite at t -> 0.
    """
    theta_sq = jnp.sum(log_rot * log_rot, axis=-1)
    theta = jnp.sqrt(jnp.clip(theta_sq, eps * eps))
    k = hat(log_rot)
    # K^2 = v v^T - theta^2 I, computed without a matmul so the result is exact
    # in float32 regardless of the platform's default matmul precision.
    outer = log_rot[..., :, None] * log_rot[..., None, :]
    a = (jnp.sin(theta) / theta)[..., None, None]
    b = ((1.0 - jnp.cos(theta)) / (theta * theta))[..., None, None]
    eye = jnp.eye(3, dtype=log_rot.dtype)
    return (1.0 - b * (theta * theta)[..., None, None]) * eye + a * k + b * outer
