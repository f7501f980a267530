"""Mixed-precision policy for the MXU-bound ops (matmuls / convolutions).

TPU-first design: parameters, BatchNorm statistics, and the splat/slice
kernels stay float32; the large contractions (1x1 point projections, grid
convolutions, ResNet) optionally run with bfloat16 operands and float32
accumulation (``preferred_element_type``), which roughly doubles MXU
throughput and halves activation HBM traffic on v5e.

The reference is float32-only (torch CUDA, /root/reference/train_*.py); this
is an additive capability, off by default.  Enable globally via
``set_default_mxu_dtype(jnp.bfloat16)`` (the CLIs read ``model.mxu_dtype``
from the YAML config) or per-module via the ``dtype`` attribute.

Note: the default is read at *trace* time.  Set it before the first
jit-compiled call of a model and don't flip it between calls of the same
jitted function (the cached trace would go stale); constructing a fresh
model/jit per setting is always safe.
"""

from typing import Any, Optional

import jax.numpy as jnp

_DEFAULT: list = [None]  # None -> plain float32 compute


def set_default_mxu_dtype(dtype: Optional[Any]):
    """dtype: None (float32), jnp.bfloat16, or a string like 'bfloat16'."""
    if isinstance(dtype, str):
        dtype = None if dtype in ("float32", "f32", "none") else \
            jnp.dtype(dtype).type
    _DEFAULT[0] = dtype


def resolve(dtype: Optional[Any]):
    return dtype if dtype is not None else _DEFAULT[0]


def cast_operands(dtype, *arrays):
    """Cast matmul/conv operands to the compute dtype (no-op when None)."""
    if dtype is None:
        return arrays
    return tuple(a.astype(dtype) for a in arrays)


import flax.linen as nn  # noqa: E402  (kept below the policy helpers)
import jax  # noqa: E402


class MXUDense(nn.Module):
    """Drop-in ``nn.Dense`` whose contraction runs at the policy dtype with
    float32 accumulation; parameters and output stay float32 (same param
    names as ``nn.Dense`` — checkpoints interchange)."""

    features: int
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        dt = resolve(self.dtype)
        xq, kq = cast_operands(dt, x, kernel)
        # same-dtype operands with an f32 cast after (not
        # preferred_element_type): keeps the dot VJP's operand dtypes
        # consistent; the MXU accumulates bf16 products in f32 regardless
        y = jax.lax.dot_general(
            xq, kq, (((xq.ndim - 1,), (0,)), ((), ()))).astype(jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", self.bias_init, (self.features,))
        return y


class MXUConv(nn.Module):
    """``nn.Conv`` drop-in: policy-dtype operands, float32 result, same
    param names/shapes as ``nn.Conv`` (checkpoints and the torch converter
    interchange).

    Standalone module (not an ``nn.Conv`` subclass) for two reasons: the
    policy dtype is resolved at trace time without mutating the frozen
    module, and the convolution runs through ``ops.conv_safe`` so grouped
    kernel grads stay correct under multi-axis meshes."""

    features: int
    kernel_size: Any = (3, 3)
    strides: Any = 1
    padding: Any = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        from cloud_transformers_tpu.ops.conv_safe import conv_general_safe

        ksize = ((self.kernel_size,) * (x.ndim - 2)
                 if isinstance(self.kernel_size, int)
                 else tuple(self.kernel_size))
        ndim = len(ksize)
        assert x.ndim == ndim + 2, (x.shape, ksize)
        strides = ((self.strides,) * ndim if isinstance(self.strides, int)
                   else tuple(self.strides))
        if isinstance(self.padding, str):
            padding = self.padding
        elif isinstance(self.padding, int):
            padding = ((self.padding, self.padding),) * ndim
        else:
            padding = tuple(
                (p, p) if isinstance(p, int) else tuple(p)
                for p in self.padding)

        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            ksize + (in_ch // self.feature_group_count, self.features))
        dn = (("NHWC", "HWIO", "NHWC") if ndim == 2 else
              ("NDHWC", "DHWIO", "NDHWC") if ndim == 3 else
              ("NWC", "WIO", "NWC"))

        dt = resolve(self.dtype)
        xq, kq = cast_operands(dt, x, kernel)
        y = conv_general_safe(
            xq, kq, window_strides=strides, padding=padding,
            dimension_numbers=dn,
            feature_group_count=self.feature_group_count)
        y = y.astype(jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", self.bias_init, (self.features,))
        return y


# flax auto-names submodules by class __name__; keep the original names so
# parameter trees (and torch-converted checkpoints) are unchanged by the
# mixed-precision swap.
MXUDense.__name__ = "Dense"
MXUDense.__qualname__ = "Dense"
MXUConv.__name__ = "Conv"
MXUConv.__qualname__ = "Conv"
