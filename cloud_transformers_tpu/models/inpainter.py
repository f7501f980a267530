"""ShapeNet completion ("inpainter") model.

Reference: /root/reference/model_zoo/completion/inpainter.py — an Encoder that
is the classifier backbone ending in a 1024-d latent, a mapping to ``z``, and
an AdaIN-conditioned 12-block decoder over a labeled sphere-noise cloud
[B, P, 4] (xyz + is-real-point label), keys driven by the noise xyz.
"""

import flax.linen as nn
import jax.numpy as jnp

from cloud_transformers_tpu.models import register
from cloud_transformers_tpu.models.classifier import (
    DEFAULT_STAGE_PLAN,
    ClassifierBackbone,
    mhct_block_configs,
)
from cloud_transformers_tpu.nn.init import torch_kernel_init, torch_bias_init
from cloud_transformers_tpu.nn.multihead import _bn
from cloud_transformers_tpu.nn.multihead_adain import MultiHeadUnionAdaIn
from cloud_transformers_tpu.nn.norm import AdaIn1d
from cloud_transformers_tpu.nn.precision import MXUDense


class CompletionEncoder(nn.Module):
    """Backbone -> Linear(2048, 1024) + BN + ReLU (inpainter.py:23-116).

    Size knobs default to the production network; the driver's multichip
    dryrun instantiates the same class with tiny values (same code path —
    see ClassifierBackbone)."""

    model_dim: int = 512
    latent_width: int = 1024
    repeats: int = 4
    stage_plan: tuple = DEFAULT_STAGE_PLAN
    pool_heads: int = 16
    pool_feature_dims: tuple = (32, 16)
    pool_sizes: tuple = (8, 16)
    trunk_width: int = 64

    @nn.compact
    def __call__(self, pcd, train=True):
        _, pooled, stats = ClassifierBackbone(
            model_dim=self.model_dim, repeats=self.repeats,
            stage_plan=self.stage_plan, pool_heads=self.pool_heads,
            pool_feature_dims=self.pool_feature_dims,
            pool_sizes=self.pool_sizes, trunk_width=self.trunk_width,
            name="backbone")(pcd, train=train)
        # pooled is [B, 2*trunk_width*pool_heads] (2048 in production)
        z = MXUDense(self.latent_width, kernel_init=torch_kernel_init(),
                     bias_init=torch_bias_init(
                         2 * self.trunk_width * self.pool_heads),
                     name="class_head")(pooled)
        z = nn.relu(_bn(train, name="class_head_bn")(z))
        return z, stats


class AdaInStage(nn.Module):
    """One repeat of the 3-AdaIN-union pattern (scan cell body)."""

    model_dim: int = 512
    stage_plan: tuple = DEFAULT_STAGE_PLAN
    train: bool = True

    @nn.compact
    def __call__(self, x, z, keys_xyz):
        import jax.numpy as jnp
        stats = []
        for i, cfg in enumerate(
                mhct_block_configs(repeats=1, plan=self.stage_plan)):
            x, s = MultiHeadUnionAdaIn(model_dim=self.model_dim,
                                       model_dim_out=self.model_dim,
                                       name=f"union_{i}", **cfg)(
                x, z, keys_xyz, self.train)
            stats += s
        stacked = {k: jnp.stack([s[k] for s in stats]) for k in stats[0]}
        return x, stacked


class AdaInDecoder(nn.Module):
    """Shared AdaIN decoder trunk: 12 MultiHeadUnionAdaIn blocks as a
    scanned+rematerialized 4x stage loop (inpainter.py:130-155 /
    reconstructor.py:38-63; see MHCTTrunk for the scan rationale)."""

    model_dim: int = 512
    remat: bool = True
    repeats: int = 4
    stage_plan: tuple = DEFAULT_STAGE_PLAN
    remat_policy: str = "point_io"  # see MHCTTrunk.remat_policy

    @nn.compact
    def __call__(self, x, z, keys_xyz, train=True):
        from cloud_transformers_tpu.nn.multihead import remat_save_policy
        cell = AdaInStage
        if self.remat:
            cell = nn.remat(cell, prevent_cse=False,
                            policy=remat_save_policy(self.remat_policy))
        scan = nn.scan(
            cell,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=self.repeats,
            metadata_params={nn.PARTITION_NAME: None},
        )
        x, stats_sc = scan(model_dim=self.model_dim,
                           stage_plan=self.stage_plan, train=train,
                           name="stages")(x, z, keys_xyz)
        n = next(iter(stats_sc.values())).shape[1]
        stats = [{k: stats_sc[k][r, i] for k in stats_sc}
                 for r in range(self.repeats) for i in range(n)]
        return x, stats


@register("completion_inpainter")
class Inpainter(nn.Module):
    """``__call__(noise [B,P,4], partial [B,Pin,3])`` -> ([B,P,3], stats)."""

    num_latent: int = 512
    model_dim: int = 512
    latent_width: int = 1024              # encoder Linear width
    encoder_repeats: int = 4
    decoder_repeats: int = 4
    stage_plan: tuple = DEFAULT_STAGE_PLAN
    pool_heads: int = 16
    pool_feature_dims: tuple = (32, 16)
    pool_sizes: tuple = (8, 16)
    trunk_width: int = 64

    remat_policy: str = "point_io"  # see MHCTTrunk.remat_policy

    @nn.compact
    def __call__(self, noise, partial, train=True):
        z, enc_stats = CompletionEncoder(
            model_dim=self.model_dim, latent_width=self.latent_width,
            repeats=self.encoder_repeats, stage_plan=self.stage_plan,
            pool_heads=self.pool_heads,
            pool_feature_dims=self.pool_feature_dims,
            pool_sizes=self.pool_sizes, trunk_width=self.trunk_width,
            name="encoder")(partial, train=train)
        z = nn.relu(MXUDense(self.num_latent, kernel_init=torch_kernel_init(),
                             bias_init=torch_bias_init(self.latent_width),
                             name="mapping")(z))

        x = MXUDense(self.model_dim, use_bias=False,
                     kernel_init=torch_kernel_init(), name="start_conv")(noise)
        x = nn.relu(AdaIn1d(self.model_dim, name="start_adain")(x, z))

        x, dec_stats = AdaInDecoder(model_dim=self.model_dim,
                                    repeats=self.decoder_repeats,
                                    stage_plan=self.stage_plan,
                                    remat_policy=self.remat_policy,
                                    name="decoder")(
            x, z, noise[..., :3], train=train)

        # final head re-concats the noise channels (inpainter.py:157-162,182)
        x = jnp.concatenate([x, noise], axis=-1)
        x = MXUDense(self.model_dim, use_bias=False,
                     kernel_init=torch_kernel_init(), name="final_conv1")(x)
        x = nn.relu(AdaIn1d(self.model_dim, name="final_adain")(x, z))
        out = MXUDense(3, kernel_init=torch_kernel_init(),
                       bias_init=torch_bias_init(self.model_dim),
                       name="final_conv2")(x)
        return out, enc_stats + dec_stats
