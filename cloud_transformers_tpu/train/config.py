"""YAML experiment configuration, schema-compatible with the reference.

Schema (SURVEY.md §2.2 P20): sections ``experiment{root, writer_root}``,
``data{...}``, ``model{generator|name, **kwargs}``, ``train{optimizer{type,..},
scheduler{type,..}, save_each, val_step, ...}``, optional ``restore{generator,
optimizer, new_lr}``.  The reference ``exec()``s the model file named by
``generator`` (utils/train_util.py:23-34); here ``generator`` (or ``name``)
resolves through the model registry instead.
"""

import copy
import os

import yaml


def load_config(path):
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    return cfg


def model_from_config(cfg):
    """Build the model named in cfg['model'] with the remaining keys as
    constructor kwargs (train_classification.py:93-102).

    ``model.mxu_dtype: bfloat16`` turns on mixed precision for the matmul/
    conv contractions (nn/precision.py) — params, BN stats, and the
    splat/slice kernels stay float32."""
    from cloud_transformers_tpu.models import get_model
    from cloud_transformers_tpu.nn.precision import set_default_mxu_dtype

    model_cfg = copy.deepcopy(cfg["model"])
    name = model_cfg.pop("generator", None) or model_cfg.pop("name")
    model_cfg.pop("name", None)
    set_default_mxu_dtype(model_cfg.pop("mxu_dtype", None))

    def tuplify(v):
        # YAML yields lists; flax module fields are static metadata and
        # must be hashable (e.g. stage_plan under nn.scan)
        return tuple(tuplify(x) for x in v) if isinstance(v, list) else v

    return get_model(name, **{k: tuplify(v) for k, v in model_cfg.items()})


def experiment_dirs(cfg, exp_name, make=True):
    """Create (experiment dir, writer dir) as the reference does
    (utils/train_util.py:53-71), without the timestamp suffix so restores are
    predictable."""
    root = cfg["experiment"]["root"]
    writer_root = cfg["experiment"].get("writer_root", root)
    exp_dir = os.path.join(root, exp_name)
    writer_dir = os.path.join(writer_root, exp_name)
    if make:
        os.makedirs(exp_dir, exist_ok=True)
        os.makedirs(writer_dir, exist_ok=True)
    return exp_dir, writer_dir
