"""Grouped convolution with an MXU-friendly execution strategy.

The MHCT grids use grouped 3x3 convs with tiny per-group channel counts
(F = 4/16 per head) — as true grouped convolutions the MXU contraction is
4*9..16*9 wide, single-digit percent utilization.  Executing them as a DENSE
conv with a block-diagonal kernel wastes groups x FLOPs, but those FLOPs are
nearly free on the 128x128 systolic array, trading ~10x wall time for
arithmetic the hardware does anyway.

Parameters stay in the grouped layout (reference parity in count and
semantics: layers/multihead_ct.py:50-65); the block-diagonal expansion is a
zero-cost einsum against an identity, so gradients to the grouped kernel are
exact.  Large per-group channels (trunk Res blocks, 32-64 ch/group) keep the
native grouped path.
"""

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from cloud_transformers_tpu.nn import precision
from cloud_transformers_tpu.nn.init import torch_kernel_init, torch_bias_init

# per-group input channels at or below this use the block-diagonal strategy
_BLOCK_DIAG_MAX_GROUP_CH = 16


class GroupedConv(nn.Module):
    """Drop-in grouped conv: ``[B, *spatial, C_in] -> [B, *spatial, features]``.

    ``dtype``: optional MXU compute dtype (nn/precision.py policy); params
    and output stay float32, accumulation is float32."""

    features: int
    kernel_size: Tuple[int, ...]
    groups: int = 1
    padding: Union[int, str] = 0
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        g = self.groups
        ci = in_ch // g
        co = self.features // g
        kernel = self.param(
            "kernel", torch_kernel_init(),
            tuple(self.kernel_size) + (ci, self.features))
        fan_in = ci
        for k in self.kernel_size:
            fan_in *= k
        bias = (self.param("bias", torch_bias_init(fan_in),
                           (self.features,))
                if self.use_bias else None)

        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape[:-2] + (in_ch, self.features),
            (("NHWC", "HWIO", "NHWC") if len(self.kernel_size) == 2
             else ("NDHWC", "DHWIO", "NDHWC")))
        pad = ([(self.padding, self.padding)] * len(self.kernel_size)
               if isinstance(self.padding, int) else self.padding)

        # policy-dtype operands, output cast back to f32 (an explicit
        # preferred_element_type=f32 with bf16 operands breaks the conv VJP:
        # the transpose conv would mix a f32 cotangent with a bf16 kernel;
        # the TPU conv accumulates in f32 internally either way)
        dt = precision.resolve(self.dtype)
        if ci <= _BLOCK_DIAG_MAX_GROUP_CH and g > 1:
            # expand grouped kernel [*k, ci, G*co] to block-diagonal dense
            # [*k, G*ci, G*co]; the identity einsum keeps grads exact
            k4 = kernel.reshape(kernel.shape[:-2] + (ci, g, co))
            eye = jnp.eye(g, dtype=kernel.dtype)
            dense = jnp.einsum("...cgo,hg->...hcgo", k4, eye)
            dense = dense.reshape(kernel.shape[:-2] + (g * ci, g * co))
            xq, kq = precision.cast_operands(dt, x, dense)
            out = jax.lax.conv_general_dilated(
                xq, kq, window_strides=(1,) * len(self.kernel_size),
                padding=pad, dimension_numbers=dn, feature_group_count=1)
        else:
            from cloud_transformers_tpu.ops.conv_safe import conv_general_safe
            xq, kq = precision.cast_operands(dt, x, kernel)
            out = conv_general_safe(
                xq, kq, window_strides=(1,) * len(self.kernel_size),
                padding=pad,
                dimension_numbers=(("NHWC", "HWIO", "NHWC")
                                   if len(self.kernel_size) == 2
                                   else ("NDHWC", "DHWIO", "NDHWC")),
                feature_group_count=g)
        out = out.astype(jnp.float32)
        if bias is not None:
            out = out + bias
        return out


# execution strategy for GridConvK: 'pallas' | 'xla' | 'auto' (per-shape
# table measured on v5e — tools/grid_conv_bench.py); env override for benching
_GRID_CONV_STRATEGY = None

# block fusion strategy for the whole splat->conv->slice unit: 'fused' runs
# ops/pallas_fused_block.py (grid stays in VMEM between the three phases);
# 'ops' runs the three kernels separately (GridConvK dispatch applies);
# 'auto' picks the measured winner.  Env override: CT_BLOCK_FUSION.
_BLOCK_FUSION = None


def set_block_fusion(name):
    """Force the MHCT block execution ('fused'/'ops'/'auto'/None)."""
    global _BLOCK_FUSION
    _BLOCK_FUSION = name


def block_fusion_strategy(sizes):
    import os
    mode = (_BLOCK_FUSION
            or os.environ.get("CT_BLOCK_FUSION", None) or "auto")
    if mode == "auto":
        # Measured on v5e, same process A/B on the production classifier
        # (batch 8, 2048 pts): STANDALONE the fused kernel wins every stage
        # shape (e.g. 2D 128^2: 7.3 vs 8.1 ms; 32^3: 9.6 vs 9.8) — but
        # IN-MODEL it loses (fwd 199.2 vs 194.1-194.4 ms; fwd+bwd 1147.9 vs
        # 1051.7): the separate kernels pipeline across blocks while the
        # fused kernel's larger VMEM footprint serializes, and under AD the
        # fused forward always materializes both grids.  The dispatch
        # overhead the fusion removes (~1-2 ms/call standalone) is already
        # hidden in-model.  'ops' is the measured winner.
        return "ops"
    return mode


def set_grid_conv_strategy(name):
    """Force GridConvK's execution strategy ('pallas'/'xla'/'auto'/None)."""
    global _GRID_CONV_STRATEGY
    _GRID_CONV_STRATEGY = name


def _grid_conv_strategy():
    import os
    return (_GRID_CONV_STRATEGY
            or os.environ.get("CT_GRID_CONV", None) or "auto")


def _pallas_wins(sizes, feat):
    """Per-shape dispatch measured on v5e (tools/grid_conv_bench.py): the
    kernel-layout Pallas conv wins on 3D grids with enough x rows to amortize
    its per-row loop; 2D grids (lanes = y only, tiny matmuls) and tiny 3D
    grids stay on the XLA grouped conv + boundary conversions."""
    return len(sizes) == 3 and sizes[0] >= 16


class GridConvK(nn.Module):
    """Grouped 3^dim 'same' conv on the Pallas kernel-layout grid
    [R=B*H, X*F_pad, lanes].

    Two execution strategies with IDENTICAL parameters (kernel
    [*3^dim, F, H*F] grouped HWIO/DHWIO + bias [H*F], as in ``GroupedConv``,
    so checkpoints and the torch converter are unaffected):

    - 'pallas': ops/pallas_grid_conv.py — conv directly in the kernel
      layout, no boundary copies (the copies measured 24% of the classifier
      forward in round 3).
    - 'xla': layout round-trip to [B, *spatial, H*F] + block-diagonal dense
      XLA conv (the round-3 shipped path).

    'auto' (default) picks per grid shape from measurements
    (tools/grid_conv_bench.py).  Replaces the grouped conv of reference
    layers/multihead_ct.py:50-65."""

    feat: int
    heads: int
    sizes: Tuple[int, ...]
    use_bias: bool = True

    @nn.compact
    def __call__(self, gk):
        from cloud_transformers_tpu.ops.pallas_grid_conv import grid_conv_k
        from cloud_transformers_tpu.core.splat_slice import (
            gridk_to_spatial, spatial_to_gridk)
        dim = len(self.sizes)
        f, h = self.feat, self.heads
        kernel = self.param("kernel", torch_kernel_init(),
                            (3,) * dim + (f, h * f))
        fan_in = f * 3 ** dim
        bias = (self.param("bias", torch_bias_init(fan_in), (h * f,))
                if self.use_bias else None)

        strategy = _grid_conv_strategy()
        if strategy == "auto":
            strategy = ("pallas" if _pallas_wins(self.sizes, f) else "xla")
        if strategy == "pallas":
            return grid_conv_k(gk, kernel, bias, self.sizes, f, h)

        # 'xla': boundary conversions + block-diagonal dense conv
        b = gk.shape[0] // h
        gs = gridk_to_spatial(gk, b, self.sizes, f)
        k4 = kernel.reshape(kernel.shape[:-2] + (f, h, f))
        eye = jnp.eye(h, dtype=kernel.dtype)
        dense = jnp.einsum("...cgo,hg->...hcgo", k4, eye)
        dense = dense.reshape(kernel.shape[:-2] + (h * f, h * f))
        dn = (("NHWC", "HWIO", "NHWC") if dim == 2
              else ("NDHWC", "DHWIO", "NDHWC"))
        xq, kq = precision.cast_operands(precision.resolve(None), gs, dense)
        out = jax.lax.conv_general_dilated(
            xq, kq, window_strides=(1,) * dim, padding=[(1, 1)] * dim,
            dimension_numbers=jax.lax.conv_dimension_numbers(
                gs.shape, dense.shape, dn), feature_group_count=1)
        out = out.astype(jnp.float32)
        if bias is not None:
            out = out + bias
        return spatial_to_gridk(out, h, self.sizes, f)


class FusedSplatConvSlice(nn.Module):
    """The whole MHCT hot loop — splat -> grouped 3^dim conv -> slice — as
    ONE Pallas kernel (ops/pallas_fused_block.py): the grid never leaves
    VMEM between the three phases.

    Parameter names/shapes are IDENTICAL to ``GridConvK``/``GroupedConv``
    (kernel [*3^dim, F, H*F] + bias [H*F]); instantiated under the same
    ``name="conv"`` scope the checkpoint tree is unchanged.  Returns
    (out [B, P, H*F], gk kernel-layout) — gk feeds the occupancy stats.
    Replaces reference layers/multihead_ct.py:50-65, 107."""

    feat: int
    heads: int
    sizes: tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self, mapping, values, pts_mask=None):
        from cloud_transformers_tpu.core.splat_slice import fused_block_mk
        dim = len(self.sizes)
        f, h = self.feat, self.heads
        kernel = self.param("kernel", torch_kernel_init(),
                            (3,) * dim + (f, h * f))
        fan_in = f * 3 ** dim
        bias = (self.param("bias", torch_bias_init(fan_in), (h * f,))
                if self.use_bias else None)
        return fused_block_mk(mapping, values, kernel, bias,
                              tuple(self.sizes), f, h, pts_mask=pts_mask)
