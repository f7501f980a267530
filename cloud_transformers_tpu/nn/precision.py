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


class MXUConv(nn.Conv):
    """``nn.Conv`` that runs at the policy dtype with a float32 result.

    Subclass keeps flax param names/shapes identical to ``nn.Conv`` so
    checkpoints and the torch converter are unaffected."""

    @nn.compact
    def __call__(self, x):
        dt = resolve(self.dtype)
        if dt is None or dt == jnp.float32:
            object.__setattr__(self, "dtype", None)
            return super().__call__(x)
        object.__setattr__(self, "dtype", dt)
        return super().__call__(x.astype(dt)).astype(jnp.float32)


# flax auto-names submodules by class __name__; keep the original names so
# parameter trees (and torch-converted checkpoints) are unchanged by the
# mixed-precision swap.
MXUDense.__name__ = "Dense"
MXUDense.__qualname__ = "Dense"
MXUConv.__name__ = "Conv"
MXUConv.__qualname__ = "Conv"
