#!/usr/bin/env python
"""Convert reference PyTorch checkpoints (.t7 state_dicts) to this
framework's parameter trees.

The reference releases pretrained weights (README.md:19-20:
``s3dis_kpconvprotocol.t7``, ``inpainting_results_epoch28.t7``,
``reconstruction_final_epoch_55.t7``); this tool lets a reference user load
them here.  Handles:

* layout transposes: Conv1d [out,in,1] -> Dense [in,out]; ConvNd
  [out,in/g,*k] -> [*k,in/g,out]; Linear [out,in] -> [in,out]
* BatchNorm weight/bias -> scale/bias, running stats -> batch_stats
* the trunk's nn.scan stacking: reference blocks ``attentions_encoder.{3r+s}``
  stack over r into the leading scan axis of ``trunk/stages/union_{s}``

Usage:
  python tools/convert_torch_checkpoint.py ckpt.t7 --model s3dis_segmenter_pad \
      --out converted/  [--points 128]
The output is an Orbax checkpoint loadable via restore_params_only.
"""

import argparse
import re
from collections import defaultdict

import numpy as np


def load_torch_state_dict(path):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(sd, dict):
        sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def conv1d_to_dense(w):
    return np.transpose(w[:, :, 0], (1, 0))


def linear_to_dense(w):
    return np.transpose(w, (1, 0))


def convnd_to_hwio(w):
    # [out, in/g, *k] -> [*k, in/g, out]
    nd = w.ndim - 2
    perm = tuple(range(2, 2 + nd)) + (1, 0)
    return np.transpose(w, perm)


def _bn(sd, prefix):
    """-> (params {scale,bias}, stats {mean,var})"""
    return ({"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]})


def _multihead(sd, prefix):
    """Reference MultiHead (layers/multihead_ct.py:9-80) -> our MultiHead
    subtree. Returns (params, batch_stats)."""
    p, s = {}, {}
    kv_p, kv_s = {}, {}
    kv_p["keys_values_pred"] = {
        "kernel": conv1d_to_dense(sd[f"{prefix}.keys_values_pred.0.weight"])}
    for ours, theirs in (("key_bn", "key_bn"), ("values_bn", "values_bn")):
        bp, bs = _bn(sd, f"{prefix}.{theirs}")
        kv_p[ours], kv_s[ours] = bp, bs
    tr = {"log_R": sd[f"{prefix}.transform.log_R"],
          "shift": sd[f"{prefix}.transform.shift"]}
    if f"{prefix}.transform.scales" in sd:
        tr["scales"] = sd[f"{prefix}.transform.scales"]
    kv_p["transform"] = tr
    p["kv"], s["kv"] = kv_p, kv_s
    p["conv"] = {"kernel": convnd_to_hwio(sd[f"{prefix}.conv.0.weight"]),
                 "bias": sd[f"{prefix}.conv.0.bias"]}
    bp, bs = _bn(sd, f"{prefix}.after.0")
    p["after_bn"], s["after_bn"] = bp, bs
    return p, s


def _union(sd, prefix, n_heads=2):
    """Reference MultiHeadUnion (multihead_ct.py:121-198)."""
    p, s = {}, {}
    for j in range(n_heads):
        hp, hs = _multihead(sd, f"{prefix}.attentions.{j}")
        p[f"attention_{j}"], s[f"attention_{j}"] = hp, hs
    p["after_conv"] = {
        "kernel": conv1d_to_dense(sd[f"{prefix}.after.0.weight"])}
    bp, bs = _bn(sd, f"{prefix}.after.1")
    p["after_bn"], s["after_bn"] = bp, bs
    if f"{prefix}.shortcut.shortcut_conv.weight" in sd:
        p["shortcut_conv"] = {"kernel": conv1d_to_dense(
            sd[f"{prefix}.shortcut.shortcut_conv.weight"])}
        bp, bs = _bn(sd, f"{prefix}.shortcut.shortcut_bn")
        p["shortcut_bn"], s["shortcut_bn"] = bp, bs
    return p, s


def _stack_trunk(sd, encoder_prefix, repeats=4, per_stage=3):
    """attentions_encoder.{repeat*per_stage + slot} -> scanned
    trunk/stages/union_{slot} with a leading repeat axis."""
    stage_p = defaultdict(list)
    stage_s = defaultdict(list)
    for r in range(repeats):
        for slot in range(per_stage):
            up, us = _union(sd, f"{encoder_prefix}.{r * per_stage + slot}")
            stage_p[f"union_{slot}"].append(up)
            stage_s[f"union_{slot}"].append(us)

    def stack(trees):
        import jax
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)

    p = {k: stack(v) for k, v in stage_p.items()}
    s = {k: stack(v) for k, v in stage_s.items()}
    return {"stages": p}, {"stages": s}


def _stem(sd, prefix, conv_idx=0, bn_idx=1):
    p = {"kernel": conv1d_to_dense(sd[f"{prefix}.{conv_idx}.weight"])}
    if f"{prefix}.{conv_idx}.bias" in sd:
        p["bias"] = sd[f"{prefix}.{conv_idx}.bias"]
    bp, bs = _bn(sd, f"{prefix}.{bn_idx}")
    return p, bp, bs


def convert_segmenter_pad(sd):
    """model_zoo/s3dis/segmenter_pad.py -> s3dis_segmenter_pad tree."""
    params, stats = {}, {}
    stem_p, stem_bn_p, stem_bn_s = _stem(sd, "first_process")
    params["stem"], params["stem_bn"] = stem_p, stem_bn_p
    stats["stem_bn"] = stem_bn_s
    tp, ts = _stack_trunk(sd, "attentions_encoder")
    params["trunk"], stats["trunk"] = tp, ts
    params["final_conv1"] = {
        "kernel": conv1d_to_dense(sd["final.0.weight"])}
    bp, bs = _bn(sd, "final.1")
    params["final_bn"], stats["final_bn"] = bp, bs
    params["final_conv2"] = {
        "kernel": conv1d_to_dense(sd["final.3.weight"]),
        "bias": sd["final.3.bias"]}
    return params, stats


convert_segmenter = convert_segmenter_pad  # same reference structure


def _resblock(sd, prefix):
    """Reference Res2D/3DBlock (v2v_groups.py:22-44 / unet_parts.py:9-31) ->
    our ResBlock's auto-named subtree."""
    p, s = {}, {}
    p["Conv_0"] = {"kernel": convnd_to_hwio(sd[f"{prefix}.res_branch.0.weight"])}
    bp, bs = _bn(sd, f"{prefix}.res_branch.1")
    p["BatchNorm_0"], s["BatchNorm_0"] = bp, bs
    p["Conv_1"] = {"kernel": convnd_to_hwio(sd[f"{prefix}.res_branch.3.weight"])}
    bp, bs = _bn(sd, f"{prefix}.res_branch.4")
    p["BatchNorm_1"], s["BatchNorm_1"] = bp, bs
    if f"{prefix}.skip_con.0.weight" in sd:
        p["Conv_2"] = {
            "kernel": convnd_to_hwio(sd[f"{prefix}.skip_con.0.weight"])}
        bp, bs = _bn(sd, f"{prefix}.skip_con.1")
        p["BatchNorm_2"], s["BatchNorm_2"] = bp, bs
    return p, s


def _pool_head(sd, prefix):
    """Reference MultiHeadPool (multihead_ct_pool.py) -> our kv subtree."""
    kv_p, kv_s = {}, {}
    kv_p["keys_values_pred"] = {
        "kernel": conv1d_to_dense(sd[f"{prefix}.keys_values_pred.0.weight"])}
    for name in ("key_bn", "values_bn"):
        bp, bs = _bn(sd, f"{prefix}.{name}")
        kv_p[name], kv_s[name] = bp, bs
    tr = {"log_R": sd[f"{prefix}.transform.log_R"],
          "shift": sd[f"{prefix}.transform.shift"]}
    if f"{prefix}.transform.scales" in sd:
        tr["scales"] = sd[f"{prefix}.transform.scales"]
    kv_p["transform"] = tr
    return {"kv": kv_p}, {"kv": kv_s}


def _backbone(sd, stem_prefix="first_process",
              encoder_prefix="attentions_encoder"):
    """ClassifierBackbone: stem + trunk + pools + Res trunks (the shared
    encoder of classifier.py and inpainter.py's Encoder)."""
    params, stats = {}, {}
    stem_p, stem_bn_p, stem_bn_s = _stem(sd, stem_prefix)
    params["stem"], params["stem_bn"] = stem_p, stem_bn_p
    stats["stem_bn"] = stem_bn_s
    tp, ts = _stack_trunk(sd, encoder_prefix)
    params["trunk"], stats["trunk"] = tp, ts
    for pool in ("pool3d", "pool2d"):
        pp, ps = _pool_head(sd, pool)
        params[pool], stats[pool] = pp, ps
    # after_pool3d Sequential: Res3D @ 0, 2, 4 -> Res3DBlock_0..2
    for i, idx in enumerate((0, 2, 4)):
        rp, rs = _resblock(sd, f"after_pool3d.{idx}")
        params[f"Res3DBlock_{i}"], stats[f"Res3DBlock_{i}"] = rp, rs
    for i, idx in enumerate((0, 2, 4)):
        rp, rs = _resblock(sd, f"after_pool2d.{idx}")
        params[f"Res2DBlock_{i}"], stats[f"Res2DBlock_{i}"] = rp, rs
    return params, stats


def convert_classifier(sd):
    """model_zoo/scanobject/classifier.py -> scanobject_classifier tree."""
    bb_p, bb_s = _backbone(sd)
    params = {"backbone": bb_p}
    stats = {"backbone": bb_s}
    params["class_vector"] = {
        "kernel": linear_to_dense(sd["class_vector.0.weight"]),
        "bias": sd["class_vector.0.bias"]}
    bp, bs = _bn(sd, "class_vector.1")
    params["class_vector_bn"], stats["class_vector_bn"] = bp, bs
    params["class_head"] = {
        "kernel": linear_to_dense(sd["class_head.1.weight"]),
        "bias": sd["class_head.1.bias"]}
    params["mask_conv1"] = {
        "kernel": conv1d_to_dense(sd["mask_head.1.weight"])}
    bp, bs = _bn(sd, "mask_head.2")
    params["mask_bn"], stats["mask_bn"] = bp, bs
    params["mask_conv2"] = {
        "kernel": conv1d_to_dense(sd["mask_head.4.weight"]),
        "bias": sd["mask_head.4.bias"]}
    return params, stats


def _adain(sd, prefix):
    """Reference AdaIn1dUpd (utils.py:82-97) -> our AdaIn1d subtree."""
    return {"Dense_0": {"kernel": linear_to_dense(sd[f"{prefix}.weight"]),
                        "bias": sd[f"{prefix}.bias"]}}


def _multihead_adain(sd, prefix):
    p = {"keys_values_pred": {
        "kernel": conv1d_to_dense(sd[f"{prefix}.keys_values_pred.0.weight"])}}
    p["keys_adain"] = _adain(sd, f"{prefix}.keys_bn.0.linear")
    p["values_adain"] = _adain(sd, f"{prefix}.values_bn.0.linear")
    p["scale"] = sd[f"{prefix}.scale"]
    tr = {"log_R": sd[f"{prefix}.transform.log_R"],
          "shift": sd[f"{prefix}.transform.shift"]}
    if f"{prefix}.transform.scales" in sd:
        tr["scales"] = sd[f"{prefix}.transform.scales"]
    p["transform"] = tr
    p["conv"] = {"kernel": convnd_to_hwio(sd[f"{prefix}.conv.0.weight"]),
                 "bias": sd[f"{prefix}.conv.0.bias"]}
    p["after_adain"] = _adain(sd, f"{prefix}.after.0.linear")
    return p


def _union_adain(sd, prefix, n_heads=2):
    p = {}
    for j in range(n_heads):
        p[f"attention_{j}"] = _multihead_adain(sd, f"{prefix}.attentions.{j}")
    p["after_conv"] = {
        "kernel": conv1d_to_dense(sd[f"{prefix}.after.0.weight"])}
    p["after_adain"] = _adain(sd, f"{prefix}.after.1.linear")
    if f"{prefix}.shortcut.shortcut_conv.weight" in sd:
        p["shortcut_conv"] = {"kernel": conv1d_to_dense(
            sd[f"{prefix}.shortcut.shortcut_conv.weight"])}
        p["shortcut_adain"] = _adain(sd, f"{prefix}.shortcut.shortcut_bn.linear")
    return p


def _stack_adain_decoder(sd, prefix, repeats=4, per_stage=3):
    stage_p = defaultdict(list)
    for r in range(repeats):
        for slot in range(per_stage):
            stage_p[f"union_{slot}"].append(
                _union_adain(sd, f"{prefix}.{r * per_stage + slot}"))

    def stack(trees):
        import jax
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)

    return {"stages": {k: stack(v) for k, v in stage_p.items()}}


def convert_inpainter(sd):
    """model_zoo/completion/inpainter.py -> completion_inpainter tree."""
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    bb_p, bb_s = _backbone(enc_sd)
    enc_p = {"backbone": bb_p,
             "class_head": {
                 "kernel": linear_to_dense(enc_sd["class_head.0.weight"]),
                 "bias": enc_sd["class_head.0.bias"]}}
    bp, bs = _bn(enc_sd, "class_head.1")
    enc_p["class_head_bn"] = bp
    enc_s = {"backbone": bb_s, "class_head_bn": bs}

    params = {"encoder": enc_p}
    stats = {"encoder": enc_s}
    params["mapping"] = {"kernel": linear_to_dense(sd["mapping.0.weight"]),
                         "bias": sd["mapping.0.bias"]}
    params["start_conv"] = {"kernel": conv1d_to_dense(sd["start.0.weight"])}
    params["start_adain"] = _adain(sd, "start.1.linear")
    params["decoder"] = _stack_adain_decoder(sd, "attentions_decoder")
    params["final_conv1"] = {"kernel": conv1d_to_dense(sd["final.0.weight"])}
    params["final_adain"] = _adain(sd, "final.1.linear")
    params["final_conv2"] = {"kernel": conv1d_to_dense(sd["final.3.weight"]),
                             "bias": sd["final.3.bias"]}
    return params, stats


# torchvision resnet50 bottleneck layout per stage
_RESNET_STAGES = (3, 4, 6, 3)


def _torchvision_resnet50(sd, prefix):
    """torchvision resnet50 (children()[:-2], reconstructor.py:16-23) ->
    our ResNet50Features subtree."""
    p, s = {}, {}
    # ResNet50Bottom wraps Sequential(children[:-2]) under `features`:
    # 0=conv1, 1=bn1, 2=relu, 3=maxpool, 4..7=layer1..4
    root = f"{prefix}.features"
    p["Conv_0"] = {"kernel": convnd_to_hwio(sd[f"{root}.0.weight"])}
    bp, bs = _bn(sd, f"{root}.1")
    p["BatchNorm_0"], s["BatchNorm_0"] = bp, bs
    bi = 0
    for stage, n_blocks in enumerate(_RESNET_STAGES):
        layer = f"{root}.{4 + stage}"
        for b in range(n_blocks):
            blk = f"{layer}.{b}"
            bp_, bs_ = {}, {}
            for ci in range(3):
                bp_[f"Conv_{ci}"] = {"kernel": convnd_to_hwio(
                    sd[f"{blk}.conv{ci + 1}.weight"])}
                nbp, nbs = _bn(sd, f"{blk}.bn{ci + 1}")
                bp_[f"BatchNorm_{ci}"], bs_[f"BatchNorm_{ci}"] = nbp, nbs
            if f"{blk}.downsample.0.weight" in sd:
                bp_["Conv_3"] = {"kernel": convnd_to_hwio(
                    sd[f"{blk}.downsample.0.weight"])}
                nbp, nbs = _bn(sd, f"{blk}.downsample.1")
                bp_["BatchNorm_3"], bs_["BatchNorm_3"] = nbp, nbs
            p[f"Bottleneck_{bi}"], s[f"Bottleneck_{bi}"] = bp_, bs_
            bi += 1
    return {"trunk": p}, {"trunk": s}


def convert_reconstructor(sd):
    """model_zoo/image_reconstruction/reconstructor.py ->
    image_reconstructor tree."""
    rp, rs = _torchvision_resnet50(sd, "res50_model.0")
    params = {"res50": rp}
    stats = {"res50": rs}
    params["mapping"] = {"kernel": linear_to_dense(sd["mapping.0.weight"]),
                         "bias": sd["mapping.0.bias"]}
    params["start_conv"] = {"kernel": conv1d_to_dense(sd["start.0.weight"])}
    params["start_adain"] = _adain(sd, "start.1.linear")
    params["decoder"] = _stack_adain_decoder(sd, "attentions_decoder")
    params["final_conv1"] = {"kernel": conv1d_to_dense(sd["final.0.weight"])}
    params["final_adain"] = _adain(sd, "final.1.linear")
    params["final_conv2"] = {"kernel": conv1d_to_dense(sd["final.3.weight"]),
                             "bias": sd["final.3.bias"]}
    return params, stats


_CONVERTERS = {
    "s3dis_segmenter": convert_segmenter_pad,
    "s3dis_segmenter_pad": convert_segmenter_pad,
    "scanobject_classifier": convert_classifier,
    "scanobject_classifier_scales": convert_classifier,
    "completion_inpainter": convert_inpainter,
    "image_reconstructor": convert_reconstructor,
}


def convert(model_name, sd):
    if model_name not in _CONVERTERS:
        raise NotImplementedError(
            f"no converter for {model_name!r} "
            f"(available: {sorted(_CONVERTERS)})")
    return _CONVERTERS[model_name](sd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    sd = load_torch_state_dict(args.checkpoint)
    params, batch_stats = convert(args.model, sd)

    import jax
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    import os
    out = os.path.abspath(args.out)
    ckptr.save(out, {"params": params, "batch_stats": batch_stats},
               force=True)
    ckptr.wait_until_finished()
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {n} params -> {out}")


if __name__ == "__main__":
    main()
