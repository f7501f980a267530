"""Boundary sharding annotations.

Model activations that cross from the point-sharded world (per-point
tensors, splat/slice) into the replicated world (pooled grids, latents)
need an explicit ``with_sharding_constraint``: left to inference, the SPMD
partitioner can pick a partitioning for the downstream convolution
kernel-gradient contraction that double-counts over the unused ``points``
mesh axis (observed on the 8-device CPU mesh: conv kernel grads exactly
``points``-times too large, everything else correct).  Annotating the
boundary tensor as batch-sharded/otherwise-replicated pins the propagation.

The helper is a no-op when no mesh is active, so model code can call it
unconditionally (single-device tests, eager use).

Reference being replaced: DDP has no such boundary — one GPU holds every
axis (/root/reference/utils/train_util_distributed.py:12-34).
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _ambient_mesh():
    """The mesh in scope at trace time: the new-style abstract mesh
    (``jax.sharding.use_mesh``) or the legacy ``with mesh:`` context."""
    try:
        m = jax.sharding.get_abstract_mesh()
        if m is not None and not m.empty:
            return m
    except Exception:
        pass
    try:
        from jax._src.mesh import thread_resources
        m = thread_resources.env.physical_mesh
        if m is not None and not m.empty:
            return m
    except Exception:
        pass
    return None


def constrain_spec(x, spec: P):
    """``with_sharding_constraint(x, spec)`` against the ambient mesh;
    identity when no mesh is active or the spec names axes the mesh lacks."""
    mesh = _ambient_mesh()
    if mesh is None:
        return x
    names = set()
    for entry in spec:
        if entry is None:
            continue
        if isinstance(entry, (tuple, list)):
            names.update(entry)
        else:
            names.add(entry)
    if not names.issubset(set(mesh.axis_names)):
        return x
    try:
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    except TypeError:
        # AbstractMesh path: bare spec resolves against the context mesh
        return jax.lax.with_sharding_constraint(x, spec)


def constrain_batch(x):
    """Pin ``x`` to batch-sharded-on-'data', replicated elsewhere.  Use on
    every activation leaving the per-point regime (pooled grids, global
    latents)."""
    return constrain_spec(x, P("data", *([None] * (x.ndim - 1))))
