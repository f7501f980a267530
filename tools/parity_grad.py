#!/usr/bin/env python
"""Backward / trajectory parity against the reference PyTorch code.

Extends tools/parity_check.py (forward-only) with the strongest parity
evidence available under zero egress (released checkpoints unreachable,
VERDICT r2 #4):

* **forward rows for the inpainter and reconstructor** (the AdaIN decoder
  path and the ResNet50 trunk — previously unchecked);
* **gradient parity** for all four model families: identical inputs +
  converted random weights, identical scalar pseudo-loss, per-parameter
  cosine between torch autograd grads (mapped through the checkpoint
  converter — its transforms are linear, so they apply to grads verbatim)
  and jax.grad;
* **a 10-step Adam trajectory A/B** (lr 1e-3) on the classifier: both
  frameworks optimize the same pseudo-loss from the same init; parameters
  are compared after steps 1/5/10;
* **train-mode BatchNorm check**: one train-mode forward (dropout forced
  off on both sides) comparing outputs AND the updated running statistics.

torchvision is not installed here; ``install_torchvision_stub`` provides a
faithful torch ResNet50 (v1.5, stride on the 3x3) with torchvision's
``children()`` order so the reference reconstructor and the converter's
key layout (tools/convert_torch_checkpoint.py:315-343) both work.

Usage:
  python tools/parity_grad.py [--points 128] [--append-report PARITY.md]
"""

import argparse
import os
import sys
import types

import numpy as np

sys.path.insert(0, ".")
from tools.parity_check import (  # noqa: E402
    REFERENCE, _cosine, install_stubs, load_reference_model)


# --------------------------------------------------------------------------
# torchvision stub: standard ResNet50 with torchvision naming/child order
# --------------------------------------------------------------------------

def install_torchvision_stub():
    import torch
    from torch import nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, layers=(3, 4, 6, 3), num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(128, layers[1], stride=2)
            self.layer3 = self._make_layer(256, layers[2], stride=2)
            self.layer4 = self._make_layer(512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * 4, num_classes)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride,
                              bias=False),
                    nn.BatchNorm2d(planes * 4))
            layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            layers += [Bottleneck(self.inplanes, planes)
                       for _ in range(1, blocks)]
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(torch.flatten(self.avgpool(x), 1))

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet50 = lambda pretrained=False, **kw: ResNet()
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models


def disable_dropout_everywhere():
    """Force dropout off on both sides so train-mode runs are
    deterministic: torch p=0, flax Dropout -> identity."""
    import flax.linen as fnn

    fnn.Dropout.__call__ = lambda self, x, *a, **k: x

    def torch_zero_dropout(model):
        import torch.nn as tnn
        for m in model.modules():
            if isinstance(m, tnn.Dropout):
                m.p = 0.0
            if hasattr(m, "p") and type(m).__name__ == "ReLUDropoutInplace":
                m.p = 0.0  # classifier.py:20-32 custom fused relu-dropout
    return torch_zero_dropout


# --------------------------------------------------------------------------
# model harnesses: build ref + ours, provide aligned outputs in both
# --------------------------------------------------------------------------

class Family:
    """One model family: reference torch model, converted flax model, and
    framework-specific forward fns returning a list of ALIGNED arrays."""

    def __init__(self, name, points=128, batch=2):
        import torch
        import jax.numpy as jnp
        from cloud_transformers_tpu.models import get_model
        from tools.convert_torch_checkpoint import convert

        self.name = name
        rng = np.random.RandomState(0)
        torch.manual_seed(0)

        if name == "scanobject_classifier":
            self.ref = load_reference_model(
                "model_zoo/scanobject/classifier.py", n_classes=15)
            self.model = get_model("scanobject_classifier", n_classes=15)
            pcd = rng.randn(batch, 3, 1, points).astype(np.float32) * 0.3
            self.t_in = (torch.from_numpy(pcd),)
            self.j_in = (jnp.asarray(np.transpose(pcd[:, :, 0], (0, 2, 1))),)
            self.t_fwd = lambda m, i: [m(*i)[0], m(*i)[1][:, 0]]
            self.j_fwd = lambda f, v, i, train: (
                lambda o: [o[0], o[1][..., 0]])(
                    f(v, *i, train=train,
                      **({"mutable": ["batch_stats"]} if train else {})))
        elif name == "s3dis_segmenter_pad":
            self.ref = load_reference_model("model_zoo/s3dis/segmenter_pad.py")
            self.model = get_model("s3dis_segmenter_pad")
            pcd = rng.randn(batch, points, 3).astype(np.float32) * 0.3
            feats = rng.rand(batch, 4, points).astype(np.float32)
            mask = np.ones((batch, points), np.float32)
            self.t_in = (torch.from_numpy(pcd), torch.from_numpy(mask),
                         torch.from_numpy(feats))
            self.j_in = (jnp.asarray(pcd), jnp.asarray(mask),
                         jnp.asarray(np.transpose(feats, (0, 2, 1))))
            self.t_fwd = lambda m, i: [m(*i)]
            self.j_fwd = lambda f, v, i, train: [
                np.transpose(_first(f(v, *i, train=train)), (0, 2, 1))]
        elif name == "completion_inpainter":
            self.ref = load_reference_model(
                "model_zoo/completion/inpainter.py")
            self.model = get_model("completion_inpainter")
            noise = rng.randn(batch, 4, points).astype(np.float32)
            part = rng.randn(batch, 3, points).astype(np.float32) * 0.3
            self.t_in = (torch.from_numpy(noise), torch.from_numpy(part))
            self.j_in = (jnp.asarray(np.transpose(noise, (0, 2, 1))),
                         jnp.asarray(np.transpose(part, (0, 2, 1))))
            self.t_fwd = lambda m, i: [m(*i)[0][:, :, 0]]  # drop unsqueeze(2)
            self.j_fwd = lambda f, v, i, train: [
                np.transpose(_first(f(v, *i, train=train)), (0, 2, 1))]
        elif name == "image_reconstructor":
            self.ref = load_reference_model(
                "model_zoo/image_reconstruction/reconstructor.py")
            self.model = get_model("image_reconstructor")
            noise = rng.randn(batch, 3, points).astype(np.float32)
            img = rng.rand(batch, 3, 64, 64).astype(np.float32)
            self.t_in = (torch.from_numpy(noise), torch.from_numpy(img))
            self.j_in = (jnp.asarray(np.transpose(noise, (0, 2, 1))),
                         jnp.asarray(np.transpose(img, (0, 2, 3, 1))))
            self.t_fwd = lambda m, i: [m(*i)[0][:, :, 0]]
            self.j_fwd = lambda f, v, i, train: [
                np.transpose(_first(f(v, *i, train=train)), (0, 2, 1))]
        else:
            raise KeyError(name)

        self.ref.eval()
        # .numpy() views alias torch storage: BN running-stat updates and
        # load_state_dict mutate IN PLACE, which would silently rewrite the
        # "captured" jax-side trees afterwards — always copy
        sd = {k: v.detach().numpy().copy()
              for k, v in self.ref.state_dict().items()}
        self.params, self.batch_stats = convert(name, sd)

    def torch_param_names(self):
        return [k for k, _ in self.ref.named_parameters()]

    def grad_tree(self, ref=None):
        """torch grads mapped through the converter into the flax layout."""
        from tools.convert_torch_checkpoint import convert
        ref = self.ref if ref is None else ref
        sd = ref.state_dict()
        grad_sd = {}
        params = dict(ref.named_parameters())
        for k, v in sd.items():
            if k in params and params[k].grad is not None:
                grad_sd[k] = params[k].grad.detach().numpy().astype(
                    np.float32).copy()
            elif k in params:
                grad_sd[k] = np.zeros(tuple(v.shape), np.float32)
            else:
                grad_sd[k] = v.detach().numpy().astype(
                    np.float32).copy()  # stats: ignored
        gp, _ = convert(self.name, grad_sd)
        return gp


def _first(out):
    """(output, stats) or ((output, stats), updates) -> output array."""
    while isinstance(out, tuple):
        out = out[0]
    return np.asarray(out)


def _projections(shapes, seed=123):
    """Mostly-coherent projections: a pure randn cotangent makes the
    parameter grads cancel to near zero, so the handful of grid-cell
    boundary flips (see PARITY.md tail note) dominates the cosine even
    though the networks match; 1 + 0.3*randn keeps a strong coherent
    signal while still exercising every output element distinctly."""
    rng = np.random.RandomState(seed)
    return [(1.0 + 0.3 * rng.randn(*s)).astype(np.float32) for s in shapes]


# --------------------------------------------------------------------------
# checks
# --------------------------------------------------------------------------

def forward_rows(fam, report):
    import torch
    with torch.no_grad():
        t_out = [o.detach().numpy() for o in fam.t_fwd(fam.ref, fam.t_in)]
    j_out = fam.j_fwd(fam.model.apply,
                      {"params": fam.params, "batch_stats": fam.batch_stats},
                      fam.j_in, False)
    lines = []
    for i, (a, b) in enumerate(zip(t_out, j_out)):
        b = np.asarray(b)
        err = np.abs(a - b)
        line = (f"| {fam.name} | out{i} {list(a.shape)} | "
                f"{np.median(err):.2e} | {np.percentile(err, 99):.2e} | "
                f"{err.max():.2e} | {_cosine(a, b):.6f} |")
        print(line)
        lines.append(line)
    report += lines
    return all(_cosine(a, np.asarray(b)) > 0.999
               for a, b in zip(t_out, j_out))


def grad_rows(fam, report):
    import torch
    import jax
    import jax.numpy as jnp

    t_out = fam.t_fwd(fam.ref, fam.t_in)
    projs = _projections([tuple(o.shape) for o in t_out])
    loss_t = sum((o * torch.from_numpy(p)).sum()
                 for o, p in zip(t_out, projs))
    fam.ref.zero_grad()
    loss_t.backward()
    g_torch = fam.grad_tree()

    # noise floors: torch vs torch with the inputs jittered at (a) 2e-5 —
    # the scale at which the two frameworks' lattice KEYS differ (PARITY.md:
    # keys agree to 1.9e-5) and (b) 1e-4 — the measured cross-framework
    # ACTIVATION difference scale (eval-mode p50 output err).  They measure
    # how much the splat rasterizer's discrete cell assignment (boundary
    # flips) moves this architecture's GRADIENTS at those scales; the
    # cross-framework perturbation is bracketed by the two, so parity is
    # judged against the floor band, not an absolute threshold
    g_floors = []
    for sigma in (2e-5, 1e-4):
        jit_in = tuple(x + sigma * torch.randn_like(x) for x in fam.t_in)
        t_out2 = fam.t_fwd(fam.ref, jit_in)
        loss_t2 = sum((o * torch.from_numpy(p)).sum()
                      for o, p in zip(t_out2, projs))
        fam.ref.zero_grad()
        loss_t2.backward()
        g_floors.append(fam.grad_tree())
    fam.ref.zero_grad()

    # float64 referee: the double-precision torch gradient is the ground
    # truth both frameworks' float32 backward passes approximate.  The
    # parity GATE: jax-f32 must be as close to the truth as torch-f32
    # itself is — i.e. the cross-framework difference is explained by f32
    # rounding, not by semantics.  (Input-jitter floors above measure the
    # rasterizer's chaotic sensitivity and stay as context columns; they
    # under-model per-op rounding, which perturbs grads directly.)
    import copy as _copy
    ref64 = _copy.deepcopy(fam.ref).double()
    ref64.eval()
    in64 = tuple(x.double() for x in fam.t_in)
    # the reference allocates its rasterization grids at torch's default
    # dtype (cloud_transform.py:164) and asserts f32 inputs (:147) — run
    # under a float64 default (and `python -O` to strip the assert)
    torch.set_default_dtype(torch.float64)
    try:
        out64 = fam.t_fwd(ref64, in64)
        loss64 = sum((o * torch.from_numpy(p).double()).sum()
                     for o, p in zip(out64, projs))
        ref64.zero_grad()
        loss64.backward()
    finally:
        torch.set_default_dtype(torch.float32)
    g_truth = fam.grad_tree(ref=ref64)
    loss_t3 = sum((o * torch.from_numpy(p)).sum()
                  for o, p in zip(fam.t_fwd(fam.ref, fam.t_in), projs))
    loss_t3.backward()  # restore original grads for the comparison below

    def loss_j(params):
        outs = fam.j_fwd(fam.model.apply,
                         {"params": params, "batch_stats": fam.batch_stats},
                         fam.j_in, False)
        return sum(jnp.sum(jnp.asarray(o) * p)
                   for o, p in zip(outs, projs))

    # j_fwd returns numpy for some families — rebuild a pure-jnp variant
    def loss_j_pure(params):
        variables = {"params": params, "batch_stats": fam.batch_stats}
        out = fam.model.apply(variables, *fam.j_in, train=False)
        o = out[0] if isinstance(out, tuple) else out
        o = jnp.asarray(o)
        if fam.name == "scanobject_classifier":
            outs = [out[0], out[1][..., 0]]
        elif fam.name in ("s3dis_segmenter_pad", "completion_inpainter",
                          "image_reconstructor"):
            outs = [jnp.transpose(o, (0, 2, 1))]
        return sum(jnp.sum(a * p) for a, p in zip(outs, projs))

    g_jax = jax.grad(loss_j_pure)(fam.params)

    flat_t = jax.tree_util.tree_leaves_with_path(g_torch)
    flat_j_map = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(g_jax)}
    flat_f_maps = [{jax.tree_util.keystr(k): v
                    for k, v in jax.tree_util.tree_leaves_with_path(gf)}
                   for gf in g_floors]
    cosines = []
    floors = [[] for _ in g_floors]
    worst = ("", 1.0)
    for path, gt in flat_t:
        key = jax.tree_util.keystr(path)
        gj = flat_j_map.get(key)
        if gj is None:
            continue
        gt = np.asarray(gt)
        gj = np.asarray(gj)
        if np.linalg.norm(gt) < 1e-12 and np.linalg.norm(gj) < 1e-12:
            continue  # untouched params (e.g. unused heads) on both sides
        c = _cosine(gt, gj)
        cosines.append(c)
        for i, fm in enumerate(flat_f_maps):
            floors[i].append(_cosine(gt, np.asarray(fm[key])))
        if c < worst[1]:
            worst = (key, c)
    def cat(m):
        return np.concatenate([np.asarray(m[jax.tree_util.keystr(p)]).ravel()
                               for p, _ in flat_t
                               if jax.tree_util.keystr(p) in m])

    flat_truth_map = {jax.tree_util.keystr(k): v
                      for k, v in jax.tree_util.tree_leaves_with_path(
                          g_truth)}
    vt = np.concatenate([np.asarray(g).ravel() for _, g in flat_t])
    vj, vtruth = cat(flat_j_map), cat(flat_truth_map)
    gc = _cosine(vt, vj)
    gfloors = [_cosine(vt, cat(fm)) for fm in flat_f_maps]
    ref_torch = _cosine(vtruth, vt)   # f64 truth vs torch-f32
    ref_jax = _cosine(vtruth, vj)     # f64 truth vs jax-f32
    med = float(np.median(cosines))
    med_fs = [float(np.median(f)) for f in floors]
    line = (f"| {fam.name} | {len(cosines)} | {gc:.6f} | {gfloors[0]:.6f} | "
            f"{gfloors[1]:.6f} | {med:.6f} | {med_fs[1]:.6f} | "
            f"{ref_jax:.6f} | {ref_torch:.6f} | "
            f"{worst[1]:.4f} {worst[0][:36]} |")
    print(line)
    report.append(line)
    # GATE on the f64 referee: jax's f32 backward must approximate the
    # double-precision gradient as well as torch's own f32 backward does
    return ref_jax >= min(0.999, ref_torch - 1e-3)


def trajectory_rows(points, report):
    """10 Adam steps (lr 1e-3) on the classifier pseudo-loss in both
    frameworks; compare full parameter vectors along the way."""
    import torch
    import jax
    import jax.numpy as jnp
    import optax
    from tools.convert_torch_checkpoint import convert

    fam = Family("scanobject_classifier", points)
    projs = None

    opt_t = torch.optim.Adam(fam.ref.parameters(), lr=1e-3)

    tx = optax.adam(1e-3)
    params = fam.params
    opt_state = tx.init(params)

    def loss_j(params):
        out = fam.model.apply(
            {"params": params, "batch_stats": fam.batch_stats},
            *fam.j_in, train=False)
        outs = [out[0], out[1][..., 0]]
        return sum(jnp.sum(a * p) for a, p in zip(outs, projs))

    grad_fn = jax.jit(jax.grad(loss_j))

    ok = True
    for step in range(1, 11):
        t_out = fam.t_fwd(fam.ref, fam.t_in)
        if projs is None:
            projs = _projections([tuple(o.shape) for o in t_out])
        loss_t = sum((o * torch.from_numpy(p)).sum()
                     for o, p in zip(t_out, projs))
        opt_t.zero_grad()
        loss_t.backward()
        opt_t.step()

        g = grad_fn(params)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)

        if step in (1, 5, 10):
            sd = {k: v.detach().numpy()
                  for k, v in fam.ref.state_dict().items()}
            p_t, _ = convert("scanobject_classifier", sd)
            vt = np.concatenate([np.asarray(x).ravel() for x in
                                 jax.tree_util.tree_leaves(p_t)])
            vj = np.concatenate([np.asarray(x).ravel() for x in
                                 jax.tree_util.tree_leaves(params)])
            c = _cosine(vt, vj)
            err = float(np.abs(vt - vj).max())
            line = f"| {step} | {c:.6f} | {err:.2e} |"
            print(line)
            report.append(line)
            ok = ok and c > 0.999
    return ok


def inpainter_trajectory_rows(points, batch, steps, report):
    """>=50 Adam steps on the inpainter with the REAL training loss —
    mean(sqrt(EMD(recon, gt, 0.005, 50))) + chamfer_weight * loss_chamfer
    (reference /root/reference/train_inpainter.py:187-192) — in TRAIN mode
    (BatchNorm batch stats + running-stat updates; dropout forced off), in
    both frameworks from the same converted init on the same fixed batch.

    The reference EMD/chamfer extensions are CUDA-only (zero egress, no
    GPU), so the torch side mirrors their documented semantics exactly:

    * **EMD assignment oracle**: both sides use the SAME auction
      (losses/emd.py — itself unit-tested against scipy's Hungarian).  The
      torch side runs it on the detached reconstruction each step and
      differentiates sqrt(|recon - gt[assign]|^2) through the FIXED
      assignment — exactly the CUDA module's backward
      (emd_cuda.cu:284-316, emd_module.py:62-70).
    * **Chamfer**: pure-torch pairwise min, gradient through the argmin
      winner — the fixed-idx backward of chamfer_extension
      (dist_chamfer.py:43-56).  loss = mean(d1) + mean(d2)
      (dist_chamfer.py:67-76); chamfer_weight is forced NONZERO (configs
      ship 0.0) so the chamfer gradient path is exercised too.

    The floor trajectory is torch-vs-torch with inputs jittered at 2e-5
    (the measured cross-framework key scale): train-mode BN + two chaotic
    rasterizers + a discrete assignment make same-framework divergence the
    only fair yardstick for cross-framework divergence."""
    import torch
    import jax
    import jax.numpy as jnp
    import optax
    from cloud_transformers_tpu.losses import emd_auction, loss_chamfer
    from tools.convert_torch_checkpoint import convert

    chamfer_weight = 0.5
    emd_eps, emd_iters = 0.005, 50
    CHECK_STEPS = sorted({s for s in (1, 10, 25, steps) if s <= steps})
    fam = Family("completion_inpainter", points, batch)
    zero_dropout = disable_dropout_everywhere()
    zero_dropout(fam.ref)
    import flax.linen as fnn
    fnn.Dropout.__call__ = lambda self, x, deterministic=None, rng=None: x

    rng = np.random.RandomState(7)
    gt_np = rng.randn(batch, points, 3).astype(np.float32) * 0.3
    gt_t = torch.from_numpy(gt_np)
    gt_j = jnp.asarray(gt_np)

    assign_fn = jax.jit(lambda r, g: emd_auction(r, g, eps=emd_eps,
                                                 iters=emd_iters)[1])

    def torch_loss(model, inputs):
        recon = model(*inputs)[0][:, :, 0].permute(0, 2, 1)  # [B, N, 3]
        assign = np.asarray(assign_fn(
            jnp.asarray(recon.detach().numpy()), gt_j))
        matched = torch.gather(
            gt_t, 1, torch.from_numpy(assign).long()[..., None].expand(
                -1, -1, 3))
        dist = ((recon - matched) ** 2).sum(-1)
        loss = torch.sqrt(dist + 1e-12).mean()
        d = ((recon[:, :, None, :] - gt_t[:, None, :, :]) ** 2).sum(-1)
        loss = loss + chamfer_weight * (d.min(2).values.mean()
                                        + d.min(1).values.mean())
        return loss

    def run_torch(jitter_sigma):
        import copy as _copy
        model = _copy.deepcopy(fam.ref)
        zero_dropout(model)
        model.train()
        inputs = fam.t_in if not jitter_sigma else tuple(
            x + jitter_sigma * torch.randn_like(x) for x in fam.t_in)
        opt = torch.optim.Adam(model.parameters(), lr=1e-3)
        snaps, losses = {}, {}
        for step in range(1, steps + 1):
            loss = torch_loss(model, inputs)
            opt.zero_grad()
            loss.backward()
            opt.step()
            if step in CHECK_STEPS:
                sd = {k: v.detach().numpy().copy()
                      for k, v in model.state_dict().items()}
                snaps[step], _ = convert("completion_inpainter", sd)
                losses[step] = float(loss)
        return snaps, losses

    def loss_j(params, batch_stats):
        out, updates = fam.model.apply(
            {"params": params, "batch_stats": batch_stats},
            *fam.j_in, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        recon = out[0]                                      # [B, N, 3]
        dist, _ = emd_auction(recon, gt_j, eps=emd_eps, iters=emd_iters)
        loss = jnp.mean(jnp.sqrt(dist + 1e-12))
        loss = loss + chamfer_weight * loss_chamfer(recon, gt_j)
        return loss, updates["batch_stats"]

    tx = optax.adam(1e-3)
    params, batch_stats = fam.params, fam.batch_stats
    opt_state = tx.init(params)
    step_fn = jax.jit(jax.value_and_grad(loss_j, has_aux=True))
    j_snaps, j_losses = {}, {}
    for step in range(1, steps + 1):
        (loss, batch_stats), g = step_fn(params, batch_stats)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        if step in CHECK_STEPS:
            j_snaps[step] = jax.device_get(params)
            j_losses[step] = float(loss)

    t_snaps, t_losses = run_torch(0.0)
    f_snaps, f_losses = run_torch(2e-5)

    def flat(tree):
        return np.concatenate([np.asarray(x).ravel() for x in
                               jax.tree_util.tree_leaves(tree)])

    ok = True
    for step in CHECK_STEPS:
        vt, vj, vf = flat(t_snaps[step]), flat(j_snaps[step]), \
            flat(f_snaps[step])
        c, cf = _cosine(vt, vj), _cosine(vt, vf)
        line = (f"| {step} | {c:.6f} | {cf:.6f} | "
                f"{np.abs(vt - vj).max():.2e} | {t_losses[step]:.5f} | "
                f"{j_losses[step]:.5f} | {f_losses[step]:.5f} |")
        print(line)
        report.append(line)
        ok = ok and c >= min(0.999, cf - 1e-3)
    return ok


def train_bn_rows(points, report):
    """One train-mode forward (dropout off): outputs and the updated
    BatchNorm running statistics, judged against a torch-vs-torch floor.

    Train mode is *more* chaotic than eval mode: normalization uses the
    computed batch statistics, so a single grid-cell boundary flip perturbs
    the stats and thereby EVERY downstream activation (in eval mode the
    running stats are fixed constants and a flip stays local to its point).
    The floor row re-runs torch itself from the same initial weights with
    inputs jittered by 2e-5 (the measured cross-framework key scale) and
    shows the same degradation, attributing the error to rasterizer
    discreteness rather than a BN-semantics difference."""
    import torch
    import jax
    from tools.convert_torch_checkpoint import convert

    fam = Family("scanobject_classifier", points)
    zero_dropout = disable_dropout_everywhere()
    zero_dropout(fam.ref)
    sd0 = {k: v.detach().clone()
           for k, v in fam.ref.state_dict().items()}  # pre-update snapshot

    def torch_train_once(inputs):
        """ONE train-mode forward (t_fwd calls the model twice, which would
        double-update the running stats); returns outputs + updated stats."""
        fam.ref.load_state_dict(sd0)
        fam.ref.train()
        with torch.no_grad():
            res = fam.ref(*inputs)
        outs = [res[0].detach().numpy(), res[1][:, 0].detach().numpy()]
        sd = {k: v.detach().numpy().copy()  # load_state_dict mutates in place
              for k, v in fam.ref.state_dict().items()}
        _, stats = convert("scanobject_classifier", sd)
        return outs, stats

    t_out, stats_t = torch_train_once(fam.t_in)
    # two torch-vs-torch floors: jitter at the measured cross-framework KEY
    # scale (2e-5, PARITY.md) and at the measured cross-framework ACTIVATION
    # scale (1e-4 ~ the eval-mode p50 output difference) — the cross-
    # framework perturbation is bracketed by the two
    floors = []
    for sigma in (2e-5, 1e-4):
        jit_in = tuple(x + sigma * torch.randn_like(x) for x in fam.t_in)
        floors.append(torch_train_once(jit_in))

    # dropout is tied to `train` in the models (deterministic=not train);
    # mirror the torch-side zeroing by making flax Dropout an identity for
    # the duration of this train-mode check
    import flax.linen as fnn
    orig_dropout = fnn.Dropout.__call__
    fnn.Dropout.__call__ = (
        lambda self, x, deterministic=None, rng=None: x)
    try:
        out, updates = fam.model.apply(
            {"params": fam.params, "batch_stats": fam.batch_stats},
            *fam.j_in, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
    finally:
        fnn.Dropout.__call__ = orig_dropout
    j_out = [np.asarray(out[0]), np.asarray(out[1][..., 0])]
    stats_j = updates["batch_stats"]

    ok = True
    for i, (a, b) in enumerate(zip(t_out, j_out)):
        c = _cosine(a, b)
        cf = [_cosine(a, fo[0][i]) for fo in floors]
        line = (f"| train-mode out{i} | {np.abs(a - b).max():.2e} | "
                f"{c:.6f} | {cf[0]:.6f} | {cf[1]:.6f} |")
        print(line)
        report.append(line)
        # pass if within the activation-scale floor band (BN *semantics* are
        # proven exactly by tests/test_blocks.py::TestTorchBatchNorm; this
        # full-model row can only bound the rasterizer-flip chaos)
        ok = ok and c >= min(0.999, min(cf) - 1e-3)

    def flat(tree):
        return np.concatenate([np.asarray(x).ravel() for x in
                               jax.tree_util.tree_leaves(tree)])

    vt, vj = flat(stats_t), flat(stats_j)
    vf = [flat(fo[1]) for fo in floors]
    c = _cosine(vt, vj)
    cf = [_cosine(vt, v) for v in vf]
    line = (f"| updated BN running stats | {np.abs(vt - vj).max():.2e} | "
            f"{c:.6f} | {cf[0]:.6f} | {cf[1]:.6f} |")
    print(line)
    report.append(line)
    return ok and c >= min(0.999, min(cf) - 1e-3)


FAMILIES = ["scanobject_classifier", "s3dis_segmenter_pad",
            "completion_inpainter", "image_reconstructor"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--families", default="all")
    ap.add_argument("--skip-trajectory", action="store_true")
    ap.add_argument("--traj-steps", type=int, default=50,
                    help="steps for the inpainter real-loss trajectory")
    ap.add_argument("--stages", default="fwd,grad,traj,bn",
                    help="comma subset of fwd,grad,traj,bn,traj_inpaint — "
                    "each stage "
                    "appends its report section as soon as it completes, "
                    "so a killed run keeps its finished stages (this box "
                    "is 1-core; the full tool runs >1.5h)")
    ap.add_argument("--append-report", default=None)
    args = ap.parse_args()
    sys.stdout.reconfigure(line_buffering=True)

    install_stubs()
    install_torchvision_stub()

    # CT_PORTABLE_IMPL=sorted switches the CPU splat/slice path from
    # interpret-mode Pallas to the pure-XLA sorted-segment implementation
    # (bit-tested equal, tests/test_pallas_ops.py::TestPortableImplToggle).
    # The interpret path inflates the traced graph ~an order of magnitude,
    # which matters for the trajectory stage: its jitted train step
    # (model fwd+bwd + EMD auction + chamfer) can take hours of XLA-CPU
    # compile in interpret mode on this 1-core box.
    if os.environ.get("CT_PORTABLE_IMPL"):
        from cloud_transformers_tpu.core import splat_slice as _ss
        _ss.PORTABLE_IMPL = os.environ["CT_PORTABLE_IMPL"]

    fams = FAMILIES if args.families == "all" else args.families.split(",")
    stages = args.stages.split(",")
    if args.skip_trajectory:
        stages = [s for s in stages if s not in ("traj", "bn")]

    def emit(report):
        if args.append_report:
            with open(args.append_report, "a") as f:
                f.write("\n".join(report) + "\n")

    ok = True
    fam_objs = {}

    def get_fam(name):
        if name not in fam_objs:
            fam_objs[name] = Family(name, args.points, args.batch)
        return fam_objs[name]

    if "fwd" in stages:
        report = ["", "## Forward parity: inpainter / reconstructor "
                  "(+ re-run of all four)", "",
                  f"points={args.points}, eval mode, random converted "
                  "weights.", "",
                  "| model | output | p50 err | p99 err | max err | cosine |",
                  "|---|---|---|---|---|---|"]
        for name in fams:
            ok &= forward_rows(get_fam(name), report)
        emit(report)

    if "grad" in stages:
        report = ["", "## Gradient parity (torch autograd vs jax.grad)", "",
                  "Same inputs, same converted weights, same scalar "
                  "pseudo-loss (fixed mostly-coherent projection of every "
                  "output); torch grads mapped through the converter "
                  "(linear, so valid for grads).  The *floor* columns are "
                  "torch-vs-torch with inputs jittered at the measured "
                  "cross-framework key scale (2e-5) and activation scale "
                  "(1e-4) — the rasterizer's discrete cell assignment "
                  "makes GRADIENTS chaotic at those scales, so cross-"
                  "framework agreement within the same-framework floor "
                  "band is the strongest possible claim.",
                  "",
                  "The GATE is the float64 referee: the f64 torch gradient "
                  "is the ground truth both f32 backward passes "
                  "approximate; jax passes when cos(f64, jax-f32) >= "
                  "cos(f64, torch-f32) - 1e-3 — the cross-framework "
                  "difference is then f32 rounding, not semantics.",
                  "",
                  "| model | #params | global cos | floor @2e-5 | floor "
                  "@1e-4 | median cos | med floor @1e-4 | f64-vs-jax | "
                  "f64-vs-torch | worst |",
                  "|---|---|---|---|---|---|---|---|---|---|"]
        for name in fams:
            ok &= grad_rows(get_fam(name), report)
        emit(report)

    if "traj" in stages:
        report = ["", "## 10-step Adam trajectory A/B (classifier, "
                  "lr 1e-3)", "",
                  "| step | param cosine | max |param err| |",
                  "|---|---|---|"]
        ok &= trajectory_rows(args.points, report)
        emit(report)

    if "traj_inpaint" in stages:
        report = ["", f"## {args.traj_steps}-step Adam trajectory A/B on "
                  "the REAL inpainter training loss",
                  "",
                  f"points={args.points}, batch={args.batch}, TRAIN mode "
                  "(BN batch stats; dropout off), loss = mean(sqrt(EMD("
                  "recon, gt, 0.005, 50))) + 0.5 * loss_chamfer "
                  "(train_inpainter.py:187-192; chamfer_weight forced "
                  "nonzero to exercise both gradient paths).  Shared "
                  "auction assignment oracle; torch differentiates "
                  "through the fixed assignment / argmin exactly as the "
                  "CUDA extensions do.  Floor: torch-vs-torch, inputs "
                  "jittered 2e-5.",
                  "",
                  "| step | param cos (t vs j) | floor cos (t vs t@2e-5) | "
                  "max |param err| | loss torch | loss jax | loss floor |",
                  "|---|---|---|---|---|---|---|"]
        ok &= inpainter_trajectory_rows(args.points, args.batch,
                                        args.traj_steps, report)
        emit(report)

    if "bn" in stages:
        report = ["", "## Train-mode BatchNorm (dropout forced off)", "",
                  "BatchNorm train/eval semantics (incl. the unbiased "
                  "running-var update flax omits) are proven exactly by "
                  "`tests/test_blocks.py::TestTorchBatchNorm` (atol 2e-5 "
                  "vs torch over 3 train steps + eval).  This full-model "
                  "row bounds the remaining rasterizer-flip chaos: floors "
                  "are torch-vs-torch from identical weights with inputs "
                  "jittered at the measured cross-framework key scale "
                  "(2e-5) and activation scale (1e-4) — train-mode batch "
                  "statistics globalize each grid-cell boundary flip, so "
                  "same-framework runs degrade the same way.",
                  "",
                  "| check | max err | cosine | floor @2e-5 | floor @1e-4 |",
                  "|---|---|---|---|---|"]
        ok &= train_bn_rows(args.points, report)
        emit(report)

    status = "PASS" if ok else "FAIL"
    print(f"\n{status}")
    emit([f"", f"**{status}** (stages: {','.join(stages)})"])
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
