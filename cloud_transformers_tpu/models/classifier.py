"""ScanObjectNN classifier (flagship model / north-star benchmark).

Reference: /root/reference/model_zoo/scanobject/classifier.py — Conv 3->512
stem, 12 MultiHeadUnion blocks (4 repeats of 128/64/16-2D x 32/16/8-3D pairs),
dual MultiHeadPool transitions into Res3D/Res2D trunks, fused 2048->1024 class
vector, class head, and a per-point mask head conditioned on the class vector.
``classifier_scales.py`` is the same network with per-head scale parameters
enabled.
"""

import flax.linen as nn
import jax.numpy as jnp

from cloud_transformers_tpu.models import register
from cloud_transformers_tpu.nn.conv_blocks import (
    Res2DBlock,
    Res3DBlock,
    max_pool_nd,
)
from cloud_transformers_tpu.nn.init import torch_kernel_init, torch_bias_init
from cloud_transformers_tpu.nn.multihead import (
    MultiHeadPool,
    MultiHeadUnion,
    _bn,
    remat_save_policy,
)
from cloud_transformers_tpu.nn.precision import MXUDense
from cloud_transformers_tpu.parallel.constrain import constrain_batch


# one stage = 3 unions of (features_dims, heads, tensor_sizes, tensor_dims)
# per head group (classifier.py:46-63)
DEFAULT_STAGE_PLAN = (
    ((4, 4), (16, 16), (128, 32), (2, 3)),
    ((16, 16), (16, 16), (64, 16), (2, 3)),
    ((16, 32), (16, 16), (16, 8), (2, 3)),
)
# small-shape plan for dry runs / sharding validation (same code path)
TINY_STAGE_PLAN = (
    ((4, 4), (2, 2), (16, 8), (2, 3)),
)


def _plan_to_kwargs(plan):
    return [dict(features_dims=list(f), heads=list(h),
                 tensor_sizes=list(s), tensor_dims=list(d))
            for f, h, s, d in plan]


def mhct_block_configs(repeats=4, plan=DEFAULT_STAGE_PLAN):
    """The shared 12-block MHCT trunk configuration (classifier.py:46-63,
    reused by the segmenter, the completion encoder, and the decoders)."""
    return _plan_to_kwargs(plan) * repeats


class MHCTStage(nn.Module):
    """One repeat of the 3-union pattern — the cell body for nn.scan."""

    model_dim: int = 512
    scales: bool = False
    train: bool = True
    stage_plan: tuple = DEFAULT_STAGE_PLAN

    @nn.compact
    def __call__(self, x, pcd, pts_mask):
        stats = []
        for i, cfg in enumerate(_plan_to_kwargs(self.stage_plan)):
            x, s = MultiHeadUnion(model_dim=self.model_dim,
                                  model_dim_out=self.model_dim,
                                  scales=self.scales, name=f"union_{i}",
                                  **cfg)(x, pcd, pts_mask, self.train)
            stats += s
        stacked = {k: jnp.stack([s[k] for s in stats]) for k in stats[0]}
        return x, stacked


class MHCTTrunk(nn.Module):
    """The 12-block trunk as a scanned (and rematerialized) 4x stage loop.

    TPU-first design choice: the reference unrolls 12 structurally identical
    blocks (classifier.py:46-63); under XLA that multiplies compile time by
    the block count.  ``nn.scan`` compiles the 3-union stage once and loops
    it, and ``nn.remat`` recomputes stage activations in the backward pass —
    the pre-splat/gather buffers of all 24 head groups otherwise exceed HBM.
    """

    model_dim: int = 512
    scales: bool = False
    remat: bool = True
    scan: bool = True
    repeats: int = 4
    stage_plan: tuple = DEFAULT_STAGE_PLAN
    # 'point_io': save the small per-point tensors (mapping / values / slice
    # outputs, named ct_point_io in nn/multihead.py); the block backward
    # recomputes the splat AND the grouped conv (see remat_save_policy).
    # 'point_io_grids' additionally saves the two kernel-layout grids per
    # block, trading memory for the recompute.  'full' remats everything.
    remat_policy: str = "point_io"

    @nn.compact
    def __call__(self, x, pcd, pts_mask, train=True):
        cell = MHCTStage
        if self.remat:
            cell = nn.remat(cell, prevent_cse=False,
                            policy=remat_save_policy(self.remat_policy))
        if not self.scan:
            stats = []
            for r in range(self.repeats):
                x, s = cell(model_dim=self.model_dim, scales=self.scales,
                            train=train, stage_plan=self.stage_plan,
                            name=f"stage_{r}")(x, pcd, pts_mask)
                stats += [{k: s[k][i] for k in s}
                          for i in range(next(iter(s.values())).shape[0])]
            return x, stats
        scan = nn.scan(
            cell,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=self.repeats,
            metadata_params={nn.PARTITION_NAME: None},
        )
        x, stats_sc = scan(model_dim=self.model_dim, scales=self.scales,
                           train=train, stage_plan=self.stage_plan,
                           name="stages")(x, pcd, pts_mask)
        # unstack [repeats, 6] back into the reference's flat 12x2 stats list
        n = next(iter(stats_sc.values())).shape[1]
        stats = [{k: stats_sc[k][r, i] for k in stats_sc}
                 for r in range(self.repeats) for i in range(n)]
        return x, stats


class ClassifierBackbone(nn.Module):
    """Stem + 12 MHCT blocks + dual pool trunks -> (per-point features,
    2048-d pooled vector, stats). Shared by the classifier and the
    completion encoder (inpainter.py:23-116).

    ``remat`` checkpoints each union block (recompute in backward): the
    12-block trunk's pre-splat/gather activations otherwise exceed single-chip
    HBM at training batch sizes — the standard XLA memory/FLOPs trade.

    The size knobs (``repeats``/``stage_plan``/``pool_*``/``trunk_width``)
    default to the production network; the driver's multichip dryrun
    instantiates this same class with tiny values so the validated code path
    is exactly the production one."""

    model_dim: int = 512
    scales: bool = False
    remat: bool = True
    remat_policy: str = "point_io"   # see MHCTTrunk.remat_policy
    repeats: int = 4
    stage_plan: tuple = DEFAULT_STAGE_PLAN
    pool_heads: int = 16
    pool_feature_dims: tuple = (32, 16)   # (3D, 2D) per-head feature dims
    pool_sizes: tuple = (8, 16)           # (3D, 2D) grid sizes
    trunk_width: int = 64                 # per-group planes in the Res trunks

    @nn.compact
    def __call__(self, pcd, train=True):
        x = MXUDense(self.model_dim, use_bias=False,
                     kernel_init=torch_kernel_init(), name="stem")(pcd)
        x = nn.relu(_bn(train, name="stem_bn")(x))

        x, stats = MHCTTrunk(model_dim=self.model_dim, scales=self.scales,
                             remat=self.remat,
                             remat_policy=self.remat_policy,
                             repeats=self.repeats,
                             stage_plan=self.stage_plan, name="trunk")(
            x, pcd, None, train)

        res = x
        hp = self.pool_heads

        to_3d, s3 = MultiHeadPool(in_feature_dim=self.pool_feature_dims[0],
                                  heads=hp, tensor_size=self.pool_sizes[0],
                                  tensor_dim=3, scales=self.scales,
                                  name="pool3d")(res, pcd, train=train)
        to_2d, s2 = MultiHeadPool(in_feature_dim=self.pool_feature_dims[1],
                                  heads=hp, tensor_size=self.pool_sizes[1],
                                  tensor_dim=2, scales=self.scales,
                                  name="pool2d")(res, pcd, train=train)
        stats += [s3, s2]

        # the pooled grids leave the per-point regime here: pin them to
        # batch-on-'data' so the points mesh axis can't leak into the Res
        # trunk's conv-kernel-grad partitioning (parallel/constrain.py)
        to_3d = constrain_batch(to_3d)
        to_2d = constrain_batch(to_2d)

        w = self.trunk_width
        # Res3D trunk: 512 -> 1024 with two pools -> GAP (classifier.py:74-79)
        h3 = Res3DBlock(out_planes=w * hp, groups=hp)(to_3d, train)
        h3 = max_pool_nd(h3, 2)
        h3 = Res3DBlock(out_planes=w * hp, groups=hp)(h3, train)
        h3 = max_pool_nd(h3, 2)
        h3 = Res3DBlock(out_planes=w * hp, groups=hp)(h3, train)
        pooled_3d = jnp.mean(h3, axis=(1, 2, 3))

        # Res2D trunk (classifier.py:87-92)
        h2 = Res2DBlock(out_planes=(w // 2) * hp, groups=hp)(to_2d, train)
        h2 = max_pool_nd(h2, 2)
        h2 = Res2DBlock(out_planes=w * hp, groups=hp)(h2, train)
        h2 = max_pool_nd(h2, 2)
        h2 = Res2DBlock(out_planes=w * hp, groups=hp)(h2, train)
        pooled_2d = jnp.mean(h2, axis=(1, 2))

        pooled = jnp.concatenate([pooled_2d, pooled_3d], axis=-1)  # [B, 2048]
        return res, pooled, stats


@register("scanobject_classifier")
class Classifier(nn.Module):
    """Returns (class_pred [B, n_classes], mask_pred [B, P, 1], stats)."""

    n_classes: int = 15
    model_dim: int = 512
    scales: bool = False
    remat: bool = True
    remat_policy: str = "point_io"   # see MHCTTrunk.remat_policy
    repeats: int = 4
    stage_plan: tuple = DEFAULT_STAGE_PLAN
    pool_heads: int = 16
    pool_feature_dims: tuple = (32, 16)
    pool_sizes: tuple = (8, 16)
    trunk_width: int = 64
    class_dim: int = 1024
    mask_dim: int = 256

    @nn.compact
    def __call__(self, pcd, train=True):
        res, pooled, stats = ClassifierBackbone(
            model_dim=self.model_dim, scales=self.scales, remat=self.remat,
            remat_policy=self.remat_policy,
            repeats=self.repeats, stage_plan=self.stage_plan,
            pool_heads=self.pool_heads,
            pool_feature_dims=self.pool_feature_dims,
            pool_sizes=self.pool_sizes, trunk_width=self.trunk_width,
            name="backbone")(pcd, train=train)

        cv = MXUDense(self.class_dim, kernel_init=torch_kernel_init(),
                      bias_init=torch_bias_init(pooled.shape[-1]),
                      name="class_vector")(pooled)
        class_vect = nn.relu(_bn(train, name="class_vector_bn")(cv))

        ch = nn.Dropout(0.5, deterministic=not train)(class_vect)
        class_pred = MXUDense(self.n_classes, kernel_init=torch_kernel_init(),
                              bias_init=torch_bias_init(self.class_dim),
                              name="class_head")(ch)

        # per-point mask head conditioned on the class vector
        # (classifier.py:101-107,142)
        p = res.shape[1]
        mh = jnp.concatenate(
            [res, jnp.broadcast_to(class_vect[:, None, :],
                                   (res.shape[0], p, self.class_dim))],
            axis=-1)
        mh = nn.Dropout(0.5, deterministic=not train)(mh)
        mh = MXUDense(self.mask_dim, use_bias=False,
                      kernel_init=torch_kernel_init(), name="mask_conv1")(mh)
        mh = _bn(train, name="mask_bn")(mh)
        # ReLUDropoutInplace(0.5) == dropout(relu(x)) (classifier.py:20-32)
        mh = nn.Dropout(0.5, deterministic=not train)(nn.relu(mh))
        mask_pred = MXUDense(1, kernel_init=torch_kernel_init(),
                             bias_init=torch_bias_init(self.mask_dim),
                             name="mask_conv2")(mh)

        return class_pred, mask_pred, stats


@register("scanobject_classifier_scales")
class ClassifierScales(Classifier):
    """classifier_scales.py: identical but with learned per-head scales."""

    scales: bool = True
