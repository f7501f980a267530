"""Optimizer / LR-schedule factory (optax), reference-config compatible.

The reference builds ``torch.optim.<type>`` reflectively from the YAML
(utils/train_util.py:121-133) and steps ``StepLR`` per *iteration* with the
global step (train_classification.py:272-273), i.e.
``lr = base_lr * gamma ** (step // step_size)``.  ``scale_lr`` gives all
parameters named ``scale`` (the AdaIN key-offset scalars,
multihead_ct_adain.py:90) their own learning rate
(train_classification.py:114-121).  The KPConv protocol clips gradient norm
to 10 (datasets/s3dis_closer_train.py:51) — pass ``clip_grad_norm``.
"""

from typing import Any, Dict, Optional

import optax


def make_schedule(base_lr: float, scheduler_cfg: Optional[Dict[str, Any]]):
    if not scheduler_cfg:
        return base_lr
    stype = scheduler_cfg.get("type")
    if stype == "StepLR":
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=int(scheduler_cfg["step_size"]),
            decay_rate=float(scheduler_cfg["gamma"]),
            staircase=True,
        )
    if stype in ("ReduceLROnPlateau", None):
        # plateau scheduling is host-driven; the trainer can rebuild the
        # optimizer with a new lr on restore (restore.new_lr)
        return base_lr
    if stype == "CosineAnnealingLR":
        return optax.cosine_decay_schedule(
            base_lr, int(scheduler_cfg["T_max"]),
            alpha=float(scheduler_cfg.get("eta_min", 0.0)) / base_lr
            if base_lr else 0.0)
    raise ValueError(f"unknown scheduler type {stype!r}")


def _base_opt(opt_cfg: Dict[str, Any], lr) -> optax.GradientTransformation:
    otype = opt_cfg.get("type", "Adam")
    wd = float(opt_cfg.get("weight_decay", 0.0))
    if otype == "Adam":
        betas = opt_cfg.get("betas", (0.9, 0.999))
        if wd:
            # torch Adam applies L2 into the gradient (not decoupled)
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.adam(lr, b1=float(betas[0]), b2=float(betas[1])),
            )
        return optax.adam(lr, b1=float(betas[0]), b2=float(betas[1]))
    if otype == "AdamW":
        betas = opt_cfg.get("betas", (0.9, 0.999))
        return optax.adamw(lr, b1=float(betas[0]), b2=float(betas[1]),
                           weight_decay=wd)
    if otype == "SGD":
        return optax.sgd(lr, momentum=float(opt_cfg.get("momentum", 0.0)),
                         nesterov=bool(opt_cfg.get("nesterov", False)))
    raise ValueError(f"unknown optimizer type {otype!r}")


def make_optimizer(train_cfg: Dict[str, Any], params=None):
    """Build the optax transformation from a config ``train:`` section.

    Args:
      train_cfg: dict with ``optimizer``, optional ``scheduler``,
        optional ``scale_lr`` and ``clip_grad_norm``.
      params: param pytree, required when ``scale_lr`` is set (to label
        the ``scale`` leaves).
    """
    opt_cfg = train_cfg["optimizer"]
    base_lr = float(opt_cfg.get("lr", 1e-3))
    schedule = make_schedule(base_lr, train_cfg.get("scheduler"))

    if "scale_lr" in train_cfg and params is not None:
        scale_schedule = make_schedule(float(train_cfg["scale_lr"]),
                                       train_cfg.get("scheduler"))

        def label_fn(tree):
            import flax
            flat = flax.traverse_util.flatten_dict(tree)
            labels = {k: ("scale" if k[-1] == "scale" else "main")
                      for k in flat}
            return flax.traverse_util.unflatten_dict(labels)

        tx = optax.multi_transform(
            {"main": _base_opt(opt_cfg, schedule),
             "scale": _base_opt(opt_cfg, scale_schedule)},
            label_fn)
    else:
        tx = _base_opt(opt_cfg, schedule)

    clip = train_cfg.get("clip_grad_norm")
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
    return tx
