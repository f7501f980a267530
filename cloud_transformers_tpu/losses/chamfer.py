"""Chamfer distance: tiled nearest-neighbor search, MXU-friendly.

TPU-native replacement for the reference CUDA extension
(/root/reference/chamfer_extension/chamfer.cu — tiled brute-force NN;
dist_chamfer.py — the loss wrappers; chamfer_pytorch.py — the dense oracle).

Design: the argmin indices are found with a memory-tiled scan over row chunks
(each chunk's pairwise squared distances come from one |x|^2+|y|^2-2<x,y>
matmul that XLA maps onto the MXU), with gradients stopped.  The differentiable
distances are then recomputed through a gather at the fixed indices — exactly
the reference backward semantics (chamfer.cu:155-195: grad 2*g*(x1-x2) through
saved indices to both clouds).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _nn_idx_chunked(x, y, chunk_size, y_valid=None):
    """For each point of x [B,N,3], the index of its nearest point in y [B,M,3].

    Runs in chunks of ``chunk_size`` rows of x so peak memory is
    ``B * chunk * M`` instead of ``B * N * M``.  No gradients.
    """
    b, n, _ = x.shape
    x = jax.lax.stop_gradient(x)
    y = jax.lax.stop_gradient(y)
    y_sq = jnp.sum(y * y, axis=-1)  # [B, M]
    if y_valid is not None:
        penalty = jnp.where(y_valid, 0.0, jnp.inf)  # [B, M]
    else:
        penalty = None

    num_chunks = max(1, -(-n // chunk_size))
    pad = num_chunks * chunk_size - n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="edge")
    xc = x.reshape(b, num_chunks, chunk_size, 3).transpose(1, 0, 2, 3)

    def one_chunk(x_chunk):  # [B, C, 3]
        # squared distance via the MXU; exact f32 accumulation.
        cross = jnp.einsum("bcd,bmd->bcm", x_chunk, y,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        d = (jnp.sum(x_chunk * x_chunk, -1)[..., None]
             + y_sq[:, None, :] - 2.0 * cross)
        if penalty is not None:
            d = d + penalty[:, None, :]
        return jnp.argmin(d, axis=-1).astype(jnp.int32)  # [B, C]

    idx = jax.lax.map(one_chunk, xc)  # [num_chunks, B, C]
    idx = idx.transpose(1, 0, 2).reshape(b, num_chunks * chunk_size)
    return idx[:, :n]


@partial(jax.jit, static_argnames=("chunk_size",))
def chamfer_distance(xyz1, xyz2, chunk_size=1024, valid1=None, valid2=None):
    """Bidirectional squared nearest-neighbor distances.

    Args:
      xyz1, xyz2: [B, N, 3] / [B, M, 3] clouds (channel-last).
      chunk_size: rows per NN tile.
      valid1, valid2: optional [B, N] / [B, M] bool masks; invalid points are
        excluded as NN *targets* and get distance 0 as queries.

    Returns:
      (dist1 [B,N], dist2 [B,M], idx1 [B,N], idx2 [B,M]) — squared distances,
      matching chamfer.cu:136-154 (which also returns squared dists).
      Differentiable in both clouds through the fixed indices.
    """
    idx1 = _nn_idx_chunked(xyz1, xyz2, chunk_size, y_valid=valid2)
    idx2 = _nn_idx_chunked(xyz2, xyz1, chunk_size, y_valid=valid1)

    nn1 = jnp.take_along_axis(xyz2, idx1[..., None], axis=1)
    nn2 = jnp.take_along_axis(xyz1, idx2[..., None], axis=1)
    dist1 = jnp.sum((xyz1 - nn1) ** 2, axis=-1)
    dist2 = jnp.sum((xyz2 - nn2) ** 2, axis=-1)
    if valid1 is not None:
        dist1 = jnp.where(valid1, dist1, 0.0)
    if valid2 is not None:
        dist2 = jnp.where(valid2, dist2, 0.0)
    return dist1, dist2, idx1, idx2


def loss_chamfer(pc1, pc2, chunk_size=1024):
    """Sum of mean squared NN distances (dist_chamfer.py:67-76)."""
    d1, d2, _, _ = chamfer_distance(pc1, pc2, chunk_size)
    return jnp.mean(d1) + jnp.mean(d2)


def loss_chamfer_adj(pc1, pc2, chunk_size=1024):
    """PCN-style: mean of euclidean (sqrt) distances / 2 (dist_chamfer.py:80-89)."""
    d1, d2, _, _ = chamfer_distance(pc1, pc2, chunk_size)
    eps = 1e-12  # sqrt grad guard; reference relies on dists rarely being 0
    return (jnp.mean(jnp.sqrt(d1 + eps)) + jnp.mean(jnp.sqrt(d2 + eps))) / 2.0


def loss_chamfer_2d(pc1, pc2, chunk_size=1024):
    """2D clouds padded with z=0 (dist_chamfer.py:92-98). Inputs [B,N,2]."""
    z1 = jnp.zeros(pc1.shape[:-1] + (1,), pc1.dtype)
    z2 = jnp.zeros(pc2.shape[:-1] + (1,), pc2.dtype)
    return loss_chamfer(jnp.concatenate([pc1, z1], -1),
                        jnp.concatenate([pc2, z2], -1), chunk_size)
