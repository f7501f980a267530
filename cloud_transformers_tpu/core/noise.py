"""Sphere noise and completion-input preprocessing, fixed-shape for XLA.

Reference behavior: /root/reference/utils/pcd_utils.py.  The reference's
``partial_postproces`` is a per-sample Python loop with data-dependent shapes
(strip zero-padding, pad with sphere noise to ``gt_size``, append an
is-real-point label channel).  Point clouds are permutation-invariant and every
consumer (EMD/Chamfer losses, the permutation-equivariant decoder) ignores
ordering, so here it is re-designed as a fixed-shape masked computation that
jits and shards cleanly:

  * slot i < P keeps the partial cloud's point i where valid, else noise;
  * slots P..gt_size are always noise;
  * the label channel is the validity mask.

All layouts are channel-last: clouds are ``[B, N, 3]``.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("batch", "num_pts", "dtype"))
def sphere_noise(key, batch, num_pts, dtype=jnp.float32):
    """Uniform samples on the unit sphere, ``[B, N, 3]``.

    Same distribution as /root/reference/utils/pcd_utils.py:5-13
    (theta ~ U[0, 2pi), cos(phi) ~ U[-1, 1]).
    """
    k1, k2 = jax.random.split(key)
    theta = 2.0 * jnp.pi * jax.random.uniform(k1, (batch, num_pts), dtype)
    cos_phi = 1.0 - 2.0 * jax.random.uniform(k2, (batch, num_pts), dtype)
    sin_phi = jnp.sqrt(jnp.clip(1.0 - cos_phi * cos_phi, 0.0))
    x = sin_phi * jnp.cos(theta)
    y = sin_phi * jnp.sin(theta)
    return jnp.stack([x, y, cos_phi], axis=-1)


@partial(jax.jit, static_argnames=("gt_size",))
def partial_postprocess(key, partial_pcd, gt_size):
    """Prepare completion inputs from a zero-padded partial cloud.

    Args:
      key: PRNG key.
      partial_pcd: ``[B, P, 3]`` partial cloud where invalid points are all-zero
        rows (the GRNet file format's padding convention).
      gt_size: target number of decoder input points (>= P).

    Returns:
      parts: ``[B, P, 3]`` — the partial cloud with invalid rows replaced by
        resampled (with replacement) valid points; fixed-shape equivalent of the
        reference's ``resample_pcd`` (pcd_utils.py:16-22).
      labeled_noise: ``[B, gt_size, 4]`` — xyz of real points (where valid) or
        sphere noise, plus an is-real label channel (pcd_utils.py:24-51).
    """
    b, p, _ = partial_pcd.shape
    k_noise, k_resample = jax.random.split(key)
    valid = jnp.logical_not(jnp.all(partial_pcd == 0.0, axis=-1))  # [B, P]

    noise = sphere_noise(k_noise, b, gt_size, partial_pcd.dtype)
    padded = jnp.concatenate(
        [partial_pcd, jnp.zeros((b, gt_size - p, 3), partial_pcd.dtype)], axis=1)
    valid_full = jnp.concatenate(
        [valid, jnp.zeros((b, gt_size - p), bool)], axis=1)
    xyz = jnp.where(valid_full[..., None], padded, noise)
    labeled_noise = jnp.concatenate(
        [xyz, valid_full[..., None].astype(partial_pcd.dtype)], axis=-1)

    # Resample: valid slots keep their point (so, as in the reference, every
    # valid point appears at least once); invalid slots draw a random valid
    # point with replacement.
    logits = jnp.where(valid, 0.0, -jnp.inf)  # [B, P]
    draw = jax.random.categorical(k_resample, logits[:, None, :], axis=-1,
                                  shape=(b, p))
    resampled = jnp.take_along_axis(partial_pcd, draw[..., None], axis=1)
    parts = jnp.where(valid[..., None], partial_pcd, resampled)
    return parts, labeled_noise
