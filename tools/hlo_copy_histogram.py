#!/usr/bin/env python
"""Histogram XLA `copy`/`transpose` overhead in a model's optimized HLO,
attributed to source lines.

Compiles the classifier forward (or fwd+bwd) on the current default backend,
walks the optimized HLO, and scores each top-level copy/transpose by its
PADDED byte volume (the `{perm:T(8,128)}` layout annotation: the minor-most
dim pads to 128 lanes, the second-minor to 8 sublanes) — the honest proxy
for HBM traffic on a bandwidth-bound copy.  This is the tool behind the
layout-copy accounting in ops/pallas_splat.py and nn/grouped_conv.py.

Usage: python tools/hlo_copy_histogram.py [--bwd] [--top N] [--model NAME]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2,
                "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8}

_SHAPE = re.compile(r"= ([a-z0-9]+)\[([\d,]*)\]"
                    r"(?:\{([\d,]+)(?::T\((\d+),(\d+)\))?[^}]*\})?")
_SRC = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
_OPN = re.compile(r'op_name="([^"]+)"')


def padded_bytes(dtype, dims, minor_to_major, tile):
    if not dims:
        return _DTYPE_BYTES.get(dtype, 4)
    pad = list(dims)
    if minor_to_major and tile:
        sub, lane = tile
        minor = minor_to_major[0]
        pad[minor] = -(-pad[minor] // lane) * lane
        if len(minor_to_major) > 1:
            second = minor_to_major[1]
            pad[second] = -(-pad[second] // sub) * sub
    n = 1
    for d in pad:
        n *= d
    return n * _DTYPE_BYTES.get(dtype, 4)


def build_fn(model_name, bwd):
    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.models import get_model

    model = get_model(model_name, n_classes=15)
    pcd = jax.random.normal(jax.random.PRNGKey(0), (8, 2048, 3))
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           pcd, train=False))()
    if bwd:
        def loss(v, x):
            return jnp.sum(model.apply(v, x, train=False)[0] ** 2)
        fn = jax.jit(jax.value_and_grad(loss))
    else:
        fn = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    return fn, (variables, pcd)


def histogram(hlo, top=25, bw_gbps=819.0):
    by_src = collections.Counter()
    by_src_n = collections.Counter()
    total = 0
    for line in hlo.splitlines():
        ls = line.strip()
        if not re.match(r"%?\S+ = \S+ (copy|transpose)\(", ls.split("=")[-1]
                        if False else ls) and " copy(" not in ls \
                and " transpose(" not in ls:
            continue
        kind = "copy" if " copy(" in ls else "transpose"
        m = _SHAPE.search(ls)
        if not m:
            continue
        dtype = m.group(1)
        dims = [int(d) for d in m.group(2).split(",")] if m.group(2) else []
        mtm = ([int(d) for d in m.group(3).split(",")]
               if m.group(3) else None)
        tile = ((int(m.group(4)), int(m.group(5)))
                if m.group(4) else None)
        nbytes = padded_bytes(dtype, dims, mtm, tile)
        sm = _SRC.search(ls)
        if sm:
            key = "%s:%s" % (os.path.basename(sm.group(1)), sm.group(2))
        else:
            om = _OPN.search(ls)
            key = (om.group(1)[:70] if om else "<no-metadata>")
        key = kind + " " + key
        by_src[key] += nbytes
        by_src_n[key] += 1
        total += nbytes
    # read + write traffic -> 2x bytes
    print("total copy/transpose padded bytes: %.1f MB "
          "(~%.2f ms at %d GB/s, rw)" %
          (total / 1e6, 2 * total / (bw_gbps * 1e6), bw_gbps))
    out = []
    for key, b in by_src.most_common(top):
        print("%10.2f MB  x%-4d %s" % (b / 1e6, by_src_n[key], key))
        out.append((key, b))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--model", default="scanobject_classifier")
    args = ap.parse_args()

    fn, fargs = build_fn(args.model, args.bwd)
    hlo = fn.lower(*fargs).compile().as_text()
    histogram(hlo, args.top)


if __name__ == "__main__":
    main()
