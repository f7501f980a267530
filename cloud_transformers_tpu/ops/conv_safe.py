"""Partitioner-safe grouped convolution.

XLA's SPMD partitioner (observed on jax 0.9.0, CPU backend, 8 virtual
devices) miscompiles the *kernel gradient* of a grouped convolution
(``feature_group_count > 1``) when the program runs under a multi-axis mesh
with an axis the conv does not use: the kernel grad comes back exactly
``unused_axis_size`` times too large (an extra psum over replicated
partials).  Plain convs (``feature_group_count == 1``) and dot_general are
unaffected.  Minimal repro in ``tests/test_parallel.py``.

``conv_general_safe`` is a drop-in for ``lax.conv_general_dilated`` that
dispatches to the native op in every safe case (no groups, or no ambient
multi-axis mesh) and otherwise to a ``custom_vjp`` whose backward computes

* ``d_x`` via the native transpose (empirically partitioned correctly), and
* ``d_kernel`` group by group as ``feature_group_count == 1`` kernel-grad
  convolutions (each partitioned correctly), concatenated.

The dispatch is a *trace-time* decision: jit model code under the mesh
context (``with mesh:`` / ``jax.sharding.use_mesh``), as the trainer and the
driver dryrun do.

Reference being replaced: single-GPU grouped Conv2d/3d + DDP, where no such
partitioning exists (/root/reference/layers/v2v_groups.py).
"""

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


from cloud_transformers_tpu.parallel.constrain import _ambient_mesh


def _mesh_is_multi_axis() -> bool:
    """True when >=2 mesh axes have size > 1 — the configuration in which the
    native grouped-conv kernel grad double-counts."""
    mesh = _ambient_mesh()
    if mesh is None:
        return False
    sizes = [s for s in tuple(mesh.shape.values()) if s > 1]
    return len(sizes) >= 2


class _ConvCfg(NamedTuple):
    window_strides: Tuple[int, ...]
    padding: Tuple[Tuple[int, int], ...]
    lhs_dilation: Optional[Tuple[int, ...]]
    rhs_dilation: Optional[Tuple[int, ...]]
    dimension_numbers: Tuple[str, str, str]
    feature_group_count: int


def _native(x, kernel, cfg: _ConvCfg, groups: int):
    return lax.conv_general_dilated(
        x, kernel, window_strides=cfg.window_strides, padding=cfg.padding,
        lhs_dilation=cfg.lhs_dilation, rhs_dilation=cfg.rhs_dilation,
        dimension_numbers=cfg.dimension_numbers,
        feature_group_count=groups)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _grouped_conv_safe(x, kernel, cfg: _ConvCfg):
    return _native(x, kernel, cfg, cfg.feature_group_count)


def _gcs_fwd(x, kernel, cfg):
    return _grouped_conv_safe(x, kernel, cfg), (x, kernel)


def _gcs_bwd(cfg: _ConvCfg, res, dy):
    x, kernel = res
    g = cfg.feature_group_count

    # d_x: the native transpose conv partitions correctly (only the kernel
    # grad miscounts — see module docstring)
    _, vjp_x = jax.vjp(lambda xx: _native(xx, kernel, cfg, g), x)
    d_x, = vjp_x(dy)

    # d_kernel: per-group plain convs.  Group i reads input channels
    # [i*ci, (i+1)*ci) and writes output channels [i*co, (i+1)*co) with
    # kernel[..., :, i*co:(i+1)*co]  (HWIO: kernel I dim is already per-group)
    ci = x.shape[-1] // g
    co = kernel.shape[-1] // g
    d_parts = []
    for i in range(g):
        xs = lax.slice_in_dim(x, i * ci, (i + 1) * ci, axis=-1)
        dys = lax.slice_in_dim(dy, i * co, (i + 1) * co, axis=-1)
        ks = lax.slice_in_dim(kernel, i * co, (i + 1) * co, axis=-1)
        _, vjp_k = jax.vjp(lambda kk, xs=xs: _native(xs, kk, cfg, 1), ks)
        d_parts.append(vjp_k(dys)[0])
    d_kernel = jnp.concatenate(d_parts, axis=-1)
    return d_x, d_kernel


_grouped_conv_safe.defvjp(_gcs_fwd, _gcs_bwd)


def conv_general_safe(x, kernel, *, window_strides, padding,
                      dimension_numbers, feature_group_count=1,
                      lhs_dilation=None, rhs_dilation=None):
    """``lax.conv_general_dilated`` with a partitioner-safe grouped backward.

    ``dimension_numbers`` must be the string triple (e.g. ("NHWC", "HWIO",
    "NHWC")); ``padding`` a string or explicit pair sequence."""
    ndim = x.ndim - 2
    if isinstance(padding, str):
        pad = padding
    else:
        pad = tuple((int(lo), int(hi)) for lo, hi in padding)
    cfg = _ConvCfg(
        window_strides=tuple(window_strides),
        padding=pad,
        lhs_dilation=None if lhs_dilation is None else tuple(lhs_dilation),
        rhs_dilation=None if rhs_dilation is None else tuple(rhs_dilation),
        dimension_numbers=tuple(dimension_numbers),
        feature_group_count=int(feature_group_count),
    )
    del ndim
    if cfg.feature_group_count == 1 or not _mesh_is_multi_axis():
        return _native(x, kernel, cfg, cfg.feature_group_count)
    if isinstance(pad, str):
        # resolve to explicit padding so fwd/bwd see identical geometry
        spatial = [d for d in range(x.ndim)
                   if cfg.dimension_numbers[0][d] not in ("N", "C")]
        kdims = [kernel.shape[i] for i, c in enumerate(cfg.dimension_numbers[1])
                 if c not in ("I", "O")]
        pads = lax.padtype_to_pads(
            [x.shape[d] for d in spatial], kdims, cfg.window_strides, pad)
        cfg = cfg._replace(padding=tuple(pads))
    return _grouped_conv_safe(x, kernel, cfg)
