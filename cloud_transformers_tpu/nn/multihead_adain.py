"""AdaIN-conditioned MHCT blocks (generative decoder variants).

Reference: /root/reference/layers/multihead_ct_adain.py.  Same structure as
the plain blocks but every normalization is adaptive-instance-norm driven by a
latent ``z``, and the key offsets are multiplied by a learned scalar ``scale``
initialized to 0 (multihead_ct_adain.py:90,112) — so decoder keys start at
exactly the input geometry.  Train scripts give ``*.scale`` parameters their
own learning rate (train_classification.py:114-121); see train/optim.py.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from cloud_transformers_tpu.core.grid_mapping import GridMapping, grid_mapping
from cloud_transformers_tpu.core.splat_slice import (
    splat_max_mapping_k,
    slice_grid_mapping_k,
    gridk_to_spatial,
    spatial_to_gridk,
)
from cloud_transformers_tpu.nn.grouped_conv import (
    FusedSplatConvSlice,
    GridConvK,
    block_fusion_strategy,
)
from cloud_transformers_tpu.nn.init import torch_kernel_init, torch_bias_init
from cloud_transformers_tpu.nn.multihead import (
    TensorSize,
    _sizes,
    head_stats,
)
from cloud_transformers_tpu.nn.norm import AdaIn1d
from cloud_transformers_tpu.nn.transforms import VolTransformer, PlaneTransformer
from cloud_transformers_tpu.nn.precision import MXUDense


class MultiHeadAdaIn(nn.Module):
    """Splat -> grouped conv -> Slice with AdaIN everywhere
    (multihead_ct_adain.py:19-136)."""

    in_feature_dim: int
    tensor_size: TensorSize
    tensor_dim: int
    heads: int
    scales: bool = False

    @nn.compact
    def __call__(self, x, z, orig_pcd, train=True, return_lattice=False):
        h, f, dim = self.heads, self.in_feature_dim, self.tensor_dim
        sizes = _sizes(self.tensor_size, dim)
        g = int(np.prod(sizes))
        b, p, _ = x.shape

        kv = MXUDense(h * (f + 3), use_bias=False,
                      kernel_init=torch_kernel_init(),
                      name="keys_values_pred")(x)
        keys_res = AdaIn1d(h * 3, name="keys_adain")(kv[..., : h * 3], z)
        values = AdaIn1d(h * f, name="values_adain")(kv[..., h * 3:], z)

        # learned scalar on key offsets, init 0 (multihead_ct_adain.py:90,112)
        scale = self.param("scale", nn.initializers.zeros, ())
        keys3 = (orig_pcd[:, :, None, :]
                 + scale * keys_res.reshape(b, p, h, 3))
        transform = (VolTransformer if dim == 3 else PlaneTransformer)(
            h, scales=self.scales, name="transform")
        keys = transform(keys3)
        lattice = jnp.tanh(keys)

        mapping = grid_mapping(lattice, sizes, dim)
        # named for the selective remat policy (see nn/multihead.py
        # remat_save_policy for what each policy recomputes)
        mapping = GridMapping(*(checkpoint_name(a, "ct_point_io")
                                for a in mapping))
        values = checkpoint_name(values, "ct_point_io")
        if block_fusion_strategy(sizes) == "fused":
            out, gk = FusedSplatConvSlice(feat=f, heads=h, sizes=sizes,
                                          name="conv")(mapping, values)
            stats = head_stats(gk, keys, f, h)
        else:
            gk = splat_max_mapping_k(mapping, values, sizes)
            gk = checkpoint_name(gk, "ct_grid")
            stats = head_stats(gk, keys, f, h)
            gk2 = GridConvK(feat=f, heads=h, sizes=sizes, name="conv")(gk)
            gk2 = checkpoint_name(gk2, "ct_grid")
            out = slice_grid_mapping_k(mapping, gk2, sizes, f)
        out = checkpoint_name(out, "ct_point_io")
        out = nn.relu(AdaIn1d(h * f, name="after_adain")(out, z))
        if return_lattice:
            return (out, lattice), stats
        return out, stats


class MultiHeadUnionAdaIn(nn.Module):
    """Residual union of AdaIN heads (multihead_ct_adain.py:139-218)."""

    model_dim: int
    features_dims: Sequence[int]
    tensor_sizes: Sequence[TensorSize]
    tensor_dims: Sequence[int]
    heads: Sequence[int]
    model_dim_out: Optional[int] = None
    scales: bool = False

    @nn.compact
    def __call__(self, x, z, orig_pcd, train=True):
        assert len(self.features_dims) == len(self.tensor_sizes)
        assert len(self.features_dims) == len(self.tensor_dims)
        assert len(self.features_dims) == len(self.heads)
        out_dim = (self.model_dim if self.model_dim_out is None
                   else self.model_dim_out)

        if self.model_dim != out_dim:
            residual = MXUDense(out_dim, use_bias=False,
                                kernel_init=torch_kernel_init(),
                                name="shortcut_conv")(x)
            residual = AdaIn1d(out_dim, name="shortcut_adain")(residual, z)
        else:
            residual = x

        results, stats = [], []
        for i, (fd, ts, td, hd) in enumerate(zip(
                self.features_dims, self.tensor_sizes, self.tensor_dims,
                self.heads)):
            r, s = MultiHeadAdaIn(in_feature_dim=fd, tensor_size=ts,
                                  tensor_dim=td, heads=hd, scales=self.scales,
                                  name=f"attention_{i}")(
                x, z, orig_pcd, train=train)
            results.append(r)
            stats.append(s)

        gathered = jnp.concatenate(results, axis=-1)
        gathered = MXUDense(out_dim, use_bias=False,
                            kernel_init=torch_kernel_init(),
                            name="after_conv")(gathered)
        gathered = nn.relu(AdaIn1d(out_dim, name="after_adain")(gathered, z))
        return residual + gathered, stats
