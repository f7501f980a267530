#!/usr/bin/env python
"""Benchmark: ScanObjectNN classifier inference throughput (north-star,
BASELINE.md) + fused splat+slice throughput + per-model rows.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no GPU throughput numbers (BASELINE.md), so the
artifact carries two comparisons, both computed from the B=8 row to match
the recorded protocols like-for-like (round-4 ADVICE):

* ``vs_baseline`` — against the PINNED round-1 recording
  (bench_baseline.json, frozen; the long-run trend line);
* ``vs_prev_round`` — against the newest ``BENCH_r*.json`` B=8 value
  (the round-over-round delta).

Round 4 regressed every TPU number 10-17% and attributed it to a slower
tunnel without proof; the ``calibration`` section (pinned fixed work,
``bench_calibration_ref.json``) now measures the environment each round so
raw numbers can be normalized: ``*_normalized`` fields multiply by the
calibration ratio (current/pinned) — if the environment is slower, the
ratio > 1 credits it back.  Raw numbers always stay in the artifact.

Resilience: this machine's TPU tunnel can hang for hours (ROADMAP known-gap
#5) and first compiles are minutes.  Each section therefore runs in its own
bounded subprocess; a section that hangs or dies is reported as null and the
headline line still prints from whatever completed.  Section results are
cached in .bench_cache/ keyed on the working-tree state (HEAD + status +
diff), so a re-run after a mid-bench tunnel drop resumes instead of
recompiling everything; stale fallbacks are tagged with their source rev.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# NOTE: jax's persistent compilation cache is intentionally NOT enabled
# here.  Round 4 root-caused the round-2 hang (metadata RPCs in the cache
# key wedge the axon tunnel's data plane — see utils/compile_cache.py) and
# measured the patched cache anyway: a warm hit on the classifier train
# step costs 283 s vs a 70 s plain recompile, because the serialized
# executable must ride the tunnel both ways.  The per-section subprocess +
# .bench_cache/ result cache below is the effective warm-wall strategy on
# this runtime.


# accumulated per-process timing attribution: compile seconds (first-call
# wall inside measure(), which includes trace+compile) and steady-state run
# seconds — surfaced per section in the bench JSON (round-3 VERDICT #5)
_ATTRIB = {"compile_s": 0.0, "run_s": 0.0}


def measure(fn, *args, iters=20, warmup=3):
    """Time fn. Completion is forced by a host readback of a dependent
    scalar — on this platform's tunneled runtime, block_until_ready can
    return before device execution finishes."""
    import jax
    import jax.numpy as jnp

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.sum(leaf))

    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    first = time.perf_counter() - t0
    for _ in range(max(0, warmup - 1)):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    _ATTRIB["compile_s"] += max(0.0, first - dt)
    _ATTRIB["run_s"] += dt * iters
    return dt


def bench_classifier_inference(batch=8, points=2048, mxu_dtype=None):
    """ScanObjectNN classifier forward.  ``mxu_dtype='bfloat16'`` is the
    production TPU config (PARITY.md: bf16-vs-f32 logits cosine 0.999997,
    top-1 identical); f32 is kept as a row for cross-round comparability."""
    import jax
    from cloud_transformers_tpu.models import get_model
    from cloud_transformers_tpu.nn.precision import set_default_mxu_dtype

    set_default_mxu_dtype(mxu_dtype)
    try:
        model = get_model("scanobject_classifier", n_classes=15)
        pcd = jax.random.normal(jax.random.PRNGKey(0), (batch, points, 3))
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               pcd, train=False))()
        fwd = jax.jit(lambda v, p: model.apply(v, p, train=False)[0])
        dt = measure(fwd, variables, pcd)
    finally:
        set_default_mxu_dtype(None)
    return batch / dt, dt


def bench_calibration():
    """PINNED fixed-work environment calibration — **FROZEN as of round 5,
    never edit** (shapes, seeds, op mix, iteration counts): this section
    must measure the ENVIRONMENT (tunnel + runtime + chip), not the repo's
    code, so round-over-round section comparisons have a yardstick
    (round-4 VERDICT #2: all sections regressed 10-17% with only a verbal
    "the tunnel is slower today" attribution).  Three probes, all stock
    XLA — immune to repo code changes:

    * ``calib_matmul_ms`` — 8 chained [2048,2048] f32 matmuls + tanh:
      pure device compute (MXU); moves only if the chip/runtime changes.
    * ``calib_scatter_ms`` — 1M-element scatter-max + gather into a 32k
      table: VPU/HBM-bound dynamic addressing, the resource class the
      per-point splat/slice kernels live in.
    * ``calib_dispatch_ms`` — 64 dependent tiny jit calls, one readback:
      per-dispatch tunnel overhead, the suspected round-4 regressor.

    ``calib_total_ms`` (the sum) is the normalization yardstick against
    ``bench_calibration_ref.json`` (recorded round 5, frozen).  Each probe
    reports the MIN of 3 measure() passes: the work is fixed, so noise is
    strictly additive and min is the robust estimator (measured pin-day
    spread of single passes: scatter +-1%, matmul +-10%, dispatch +-18%)."""
    import jax
    import jax.numpy as jnp

    def min3(fn, *args, iters):
        return min(measure(fn, *args, iters=iters) for _ in range(3))

    a = jax.random.normal(jax.random.PRNGKey(7), (2048, 2048), jnp.float32)

    @jax.jit
    def matmul_work(a):
        b = a
        for _ in range(8):
            b = jnp.tanh(b @ a)
        return jnp.sum(b)

    mm = min3(matmul_work, a, iters=20)

    idx = jax.random.randint(jax.random.PRNGKey(3), (1 << 20,), 0, 1 << 15)
    vals = jax.random.normal(jax.random.PRNGKey(4), (1 << 20,), jnp.float32)

    @jax.jit
    def scatter_work(idx, vals):
        table = jnp.zeros((1 << 15,), jnp.float32).at[idx].max(vals)
        return jnp.sum(table[idx] * vals)

    scat = min3(scatter_work, idx, vals, iters=20)

    x = jnp.zeros((8, 128), jnp.float32)
    tiny = jax.jit(lambda x: x + 1.0)

    def dispatch_chain(x):
        for _ in range(64):
            x = tiny(x)
        return x

    disp = min3(dispatch_chain, x, iters=10)
    return {"calib_matmul_ms": mm * 1e3, "calib_scatter_ms": scat * 1e3,
            "calib_dispatch_ms": disp * 1e3,
            "calib_total_ms": (mm + scat + disp) * 1e3}


def bench_train_step(batch=8, points=2048, mxu_dtype=None):
    """Classifier train step — fwd + bwd + Adam update — at the production
    shape (B=8 x 2048), f32.  Round-2 set a <=1.0 s target; round 4 shipped
    new conv backward kernels (pallas_grid_conv dw/dm2d) but recorded no
    train-step number (VERDICT r4 weak #3) — this puts the fwd+bwd path
    back in the round artifact."""
    import jax
    import jax.numpy as jnp
    import optax
    from cloud_transformers_tpu.models import get_model
    from cloud_transformers_tpu.nn.precision import set_default_mxu_dtype

    set_default_mxu_dtype(mxu_dtype)
    try:
        model = get_model("scanobject_classifier", n_classes=15)
        pcd = jax.random.normal(jax.random.PRNGKey(0), (batch, points, 3))
        labels = jnp.zeros((batch,), jnp.int32)
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               pcd, train=True))()
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        def loss_fn(p, bs, x, y):
            out, upd = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out[0], y).mean()
            return loss, upd["batch_stats"]

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        @jax.jit
        def step(p, bs, os_, x, y):
            (loss, bs2), grads = grad_fn(p, bs, x, y)
            updates, os2 = tx.update(grads, os_, p)
            return optax.apply_updates(p, updates), bs2, os2, loss

        dt = measure(step, params, batch_stats, opt_state, pcd, labels,
                     iters=10)
    finally:
        set_default_mxu_dtype(None)
    return dt


def bench_splat_slice(batch=8, points=2048, heads=16, feat=8, size=32):
    """Fused positions+splat+slice round trip, Mpoints/sec (counting each
    cloud point once per head group); mapping API -> Pallas kernel."""
    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.core import (grid_mapping, splat_max_mapping,
                                             slice_grid_mapping)

    key = jax.random.PRNGKey(0)
    keys = jnp.tanh(jax.random.normal(key, (batch, points, heads, 3)))
    values = jax.random.normal(key, (batch, points, heads * feat))
    sizes = (size,) * 3

    @jax.jit
    def fused(keys, values):
        m = grid_mapping(keys, sizes, 3)
        grid = splat_max_mapping(m, values, sizes)
        return slice_grid_mapping(m, grid, sizes)

    dt = measure(fused, keys, values)
    return batch * points * heads / dt / 1e6, dt


def bench_reconstructor_inference(batch=8, points=8192, im=128,
                                  mxu_dtype="bfloat16"):
    """Image->cloud reconstructor forward (ResNet50 + AdaIN decoder) with
    the bf16 MXU policy — the model family that benefits from it most.  The
    f32 row (mxu_dtype=None) quantifies the policy's value where it should
    pay (MXU-bound ResNet50 encoder)."""
    import jax
    from cloud_transformers_tpu.models import get_model
    from cloud_transformers_tpu.nn.precision import set_default_mxu_dtype

    set_default_mxu_dtype(mxu_dtype)
    try:
        model = get_model("image_reconstructor")
        noise = jax.random.normal(jax.random.PRNGKey(0), (batch, points, 3))
        img = jax.random.uniform(jax.random.PRNGKey(1), (batch, im, im, 3))
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               noise, img, train=False))()
        fwd = jax.jit(lambda v, n, i: model.apply(v, n, i, train=False)[0])
        dt = measure(fwd, variables, noise, img, iters=10)
    finally:
        set_default_mxu_dtype(None)
    return dt


def bench_inpainter_inference(batch=2, points=16384, partial=2048,
                              mxu_dtype="bfloat16"):
    """ShapeNet completion forward (noise [B,P,4] + partial -> cloud) at the
    reference protocol shapes (configs/inpainting.yaml: gt_size=16384,
    input_size=2048, batch 2), bf16 MXU policy (f32 comparison row via
    mxu_dtype=None)."""
    import jax
    from cloud_transformers_tpu.models import get_model
    from cloud_transformers_tpu.nn.precision import set_default_mxu_dtype

    set_default_mxu_dtype(mxu_dtype)
    try:
        model = get_model("completion_inpainter")
        noise = jax.random.normal(jax.random.PRNGKey(0), (batch, points, 4))
        part = jax.random.normal(jax.random.PRNGKey(1), (batch, partial, 3))
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               noise, part, train=False))()
        fwd = jax.jit(lambda v, n, p: model.apply(v, n, p, train=False)[0])
        dt = measure(fwd, variables, noise, part, iters=10)
    finally:
        set_default_mxu_dtype(None)
    return dt


# ---------------------------------------------------------------------------
# Section runner: each section is a bounded subprocess so one tunnel hang or
# pathological compile cannot zero out the whole round's bench artifact.
# ---------------------------------------------------------------------------

SECTIONS = {
    # name -> (python expression producing a dict of result fields, timeout_s)
    # calibration runs FIRST: it stamps the environment the rest of the
    # sections were measured in (pinned fixed work — see bench_calibration)
    "calibration": ("bench_calibration()", 600),
    # HEADLINE = f32 (round-4 demotion of the bf16 "production config":
    # measured bf16-vs-f32 on v5e is <1% on EVERY family — classifier
    # 196.5 vs 195.8 ms, reconstructor 0.701 vs 0.706 s, inpainter 0.391
    # vs 0.394 s — because device time is dominated by the f32 per-point
    # splat/slice kernels, not the MXU.  bf16 rows stay for the record.)
    "cls_f32": (
        "dict(zip(('clouds_per_sec','classifier_f32_ms_per_batch8'),"
        "bench_classifier_inference(mxu_dtype=None)))", 900),
    # B=32 row: a regression tripwire, not a throughput win — the splat
    # kernel alone gains at b32 (+13% Mpt/s, round 4) but the full
    # classifier measured SLOWER per cloud (40.0 vs 41.6 clouds/s, r4),
    # so b8 remains the expected headline; see ROADMAP's B=32 breakdown
    # (round-4 ADVICE: the old comment claimed a win that wasn't there).
    "cls_f32_b32": (
        "dict(zip(('clouds_per_sec_b32','classifier_f32_ms_per_batch32'),"
        "bench_classifier_inference(batch=32, mxu_dtype=None)))", 900),
    "cls_bf16": (
        "{'classifier_bf16_ms_per_batch8':"
        "bench_classifier_inference(mxu_dtype='bfloat16')[1]}", 900),
    "splat_slice": (
        "dict(zip(('splat_slice_mpoints_per_sec','splat_slice_s'),"
        "bench_splat_slice()))", 600),
    "splat_slice_b32": (
        "dict(zip(('splat_slice_mpoints_per_sec_b32','splat_slice_b32_s'),"
        "bench_splat_slice(batch=32)))", 600),
    "reconstructor": (
        "{'reconstructor_bf16_s_per_batch8': bench_reconstructor_inference()}",
        900),
    "reconstructor_f32": (
        "{'reconstructor_f32_s_per_batch8':"
        " bench_reconstructor_inference(mxu_dtype=None)}", 900),
    "inpainter": (
        "{'inpainter_bf16_s_per_batch2_16k': bench_inpainter_inference()}",
        900),
    "inpainter_f32": (
        "{'inpainter_f32_s_per_batch2_16k':"
        " bench_inpainter_inference(mxu_dtype=None)}", 900),
    "train_step": (
        "{'train_step_f32_s': bench_train_step()}", 900),
}

_MS_FIELDS = {  # seconds field -> reported milliseconds field
    "classifier_bf16_ms_per_batch8": 1e3,
    "classifier_f32_ms_per_batch8": 1e3,
    "classifier_f32_ms_per_batch32": 1e3,
    "splat_slice_s": ("splat_slice_ms", 1e3),
    "splat_slice_b32_s": ("splat_slice_b32_ms", 1e3),
    "reconstructor_bf16_s_per_batch8": ("reconstructor_bf16_ms_per_batch8",
                                        1e3),
    "reconstructor_f32_s_per_batch8": ("reconstructor_f32_ms_per_batch8",
                                       1e3),
    "inpainter_bf16_s_per_batch2_16k": ("inpainter_bf16_ms_per_batch2_16k",
                                        1e3),
    "inpainter_f32_s_per_batch2_16k": ("inpainter_f32_ms_per_batch2_16k",
                                       1e3),
    "train_step_f32_s": ("train_step_f32_ms", 1e3),
}


_REPO = os.path.dirname(os.path.abspath(__file__))
# repo-local, .gitignored cache dir (was predictable world-writable /tmp
# names — a multi-user poisoning surface; round-3 ADVICE)
_CACHE_DIR = os.path.join(_REPO, ".bench_cache")


def _tree_state():
    """Key the section cache on the WORKING TREE, not just HEAD: sha of
    HEAD + `git status --porcelain` + `git diff`, so mid-round uncommitted
    edits invalidate cached numbers (round-3 ADVICE)."""
    import hashlib
    import subprocess as sp

    def git(*args):
        try:
            return sp.run(["git"] + list(args), capture_output=True,
                          text=True, cwd=_REPO, timeout=30).stdout
        except Exception:
            return "?"

    head = git("rev-parse", "HEAD").strip() or "unknown"
    h = hashlib.sha1()
    h.update(head.encode())
    h.update(git("status", "--porcelain").encode())
    h.update(git("diff", "HEAD").encode())
    return head[:10], h.hexdigest()[:10]


def _cache_path(tree_hash, name):
    return os.path.join(_CACHE_DIR, f"{tree_hash}_{name}.json")


def _stale_result(name):
    """Newest result for this section from ANY tree state (tunnel-down
    fallback).  Returns (result, source_rev) so the artifact records which
    code version produced the number."""
    import glob
    stale = sorted(glob.glob(os.path.join(_CACHE_DIR, f"*_{name}.json")),
                   key=os.path.getmtime)
    if stale:
        try:
            res = json.load(open(stale[-1]))
            return res, res.pop("_rev", "unknown")
        except Exception:
            pass
    return None, None


def run_section(name, tree, fresh=False, stale_ok=False):
    """Run one bench section in a bounded subprocess; cache per tree state.

    Returns (result_fields, status, timing) where status is one of
    'ran' / 'cached' / 'stale@<rev>' / 'FAIL' / 'TIMEOUT' and timing is
    {'wall': s, 'compile': s, 'run': s} for fresh runs (None otherwise)."""
    expr, tmo = SECTIONS[name]
    head, tree_hash = tree
    cpath = _cache_path(tree_hash, name)
    if not fresh and os.path.exists(cpath):
        try:
            res = json.load(open(cpath))
            res.pop("_rev", None)
            return res, "cached", None
        except Exception:
            pass
    if stale_ok:  # tunnel dead — don't even try to run
        res, rev = _stale_result(name)
        return res, (f"stale@{rev}" if res else "FAIL"), None
    code = (
        "import json, sys\n"
        "sys.path.insert(0, %r)\n"
        "import bench\n"
        "from bench import *\n"
        "res = %s\n"
        "res['_attrib'] = dict(bench._ATTRIB)\n"
        "print('BENCH_RESULT ' + json.dumps(res))\n"
    ) % (_REPO, expr)
    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=tmo)
    except subprocess.TimeoutExpired:
        print(f"# section {name}: TIMEOUT after {tmo}s", file=sys.stderr)
        return None, "TIMEOUT", None
    wall = time.time() - t0
    for line in proc.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            res = json.loads(line[len("BENCH_RESULT "):])
            attrib = res.pop("_attrib", {})
            timing = {"wall": round(wall, 1),
                      "compile": round(attrib.get("compile_s", 0.0), 1),
                      "run": round(attrib.get("run_s", 0.0), 1)}
            try:
                os.makedirs(_CACHE_DIR, mode=0o700, exist_ok=True)
                json.dump({**res, "_rev": head}, open(cpath, "w"))
            except Exception:
                pass
            return res, "ran", timing
    print(f"# section {name}: rc={proc.returncode} "
          f"tail={proc.stderr[-400:]!r}", file=sys.stderr)
    return None, "FAIL", None


def tunnel_alive(timeout=150):
    """One tiny jit matmul in a bounded subprocess — False means the TPU
    tunnel is in its hung state and every section would eat its timeout."""
    code = ("import jax, jax.numpy as jnp; x = jnp.ones((256, 256)); "
            "print('ALIVE', float((x @ x).sum()))")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=timeout)
        return "ALIVE" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    t_start = time.time()
    fresh = "--fresh" in sys.argv
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    alive = tunnel_alive() if not only else True
    if not alive:
        print("# TPU tunnel unresponsive — reporting cached sections only",
              file=sys.stderr)
    tree = _tree_state()
    fields = {}
    ran = []
    timings = {}
    any_stale = False
    for name in (only or SECTIONS):
        res, status, timing = run_section(name, tree, fresh=fresh and alive,
                                          stale_ok=not alive)
        ran.append(name if status == "ran" else f"{name}:{status}")
        any_stale |= status.startswith("stale")
        if timing:
            timings[name] = timing
        if res:
            fields.update(res)

    # seconds -> milliseconds presentation fields
    out = {}
    for k, v in fields.items():
        conv = _MS_FIELDS.get(k)
        if conv is None:
            out[k] = round(v, 3)
        elif isinstance(conv, tuple):
            out[conv[0]] = round(v * conv[1], 3)
        else:
            out[k] = round(v * conv, 3)

    # headline = best clouds/sec across measured batch sizes (the protocol
    # pins 2048-pt clouds, not a batch; throughput serving uses the batch
    # that maximizes it).  Both rows stay in the JSON.
    candidates = [(v, b) for v, b in
                  ((fields.get("clouds_per_sec"), 8),
                   (fields.get("clouds_per_sec_b32"), 32)) if v]
    clouds_per_sec, headline_batch = max(candidates) if candidates else \
        (None, None)
    cps_b8 = fields.get("clouds_per_sec")
    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
    # vs_baseline: STRICTLY the B=8 row against the pinned round-1
    # recording, which was itself B=8 (round-4 ADVICE: a best-batch
    # numerator against a B=8 denominator conflates batch amortization
    # with improvement).  Null when the b8 row is missing (round-3
    # ADVICE: a 1.0 there misread as "parity").
    vs = None
    if cps_b8 and os.path.exists(baseline_path):
        try:
            base = json.load(open(baseline_path))
            if base.get("value"):
                vs = round(cps_b8 / float(base["value"]), 3)
        except Exception:
            pass

    # vs_prev_round: the same B=8 metric against the newest BENCH_r*.json
    # (the round-over-round delta the docstring promises).
    vs_prev = prev_b8 = None
    if cps_b8:
        import glob
        import re
        prevs = sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json")),
                       key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
        if prevs:
            try:
                parsed = json.load(open(prevs[-1])).get("parsed", {})
                prev_b8 = parsed.get("clouds_per_sec_b8") or parsed.get(
                    "value")
                if prev_b8:
                    vs_prev = round(cps_b8 / float(prev_b8), 3)
            except Exception:
                pass

    # calibration normalization: if the pinned-ref file exists, report the
    # environment ratio and a normalized b8 headline (raw always stays).
    calib_ratio = cps_b8_norm = None
    calib_now = fields.get("calib_total_ms")
    ref_path = os.path.join(_REPO, "bench_calibration_ref.json")
    if calib_now and os.path.exists(ref_path):
        try:
            ref = json.load(open(ref_path))
            calib_ratio = round(calib_now / float(ref["calib_total_ms"]), 4)
            if cps_b8:
                cps_b8_norm = round(cps_b8 * calib_ratio, 1)
        except Exception:
            pass

    cps_rows = {}
    for key, label in (("clouds_per_sec", "clouds_per_sec_b8"),
                       ("clouds_per_sec_b32", "clouds_per_sec_b32")):
        out.pop(key, None)
        if fields.get(key):
            cps_rows[label] = round(fields[key], 1)
    print(json.dumps({
        "metric": "clouds/sec/chip (ScanObjectNN infer, f32, 2048-pt, "
                  "best batch)",
        "value": round(clouds_per_sec, 1) if clouds_per_sec else None,
        "unit": "clouds/sec",
        "vs_baseline": vs,
        **({"vs_prev_round": vs_prev} if vs_prev else {}),
        **({"headline_batch": headline_batch} if headline_batch else {}),
        # explicit marker when the headline's batch protocol differs from
        # the baseline's B=8 (round-4 ADVICE: silent protocol flips make
        # round-over-round headlines non-comparable)
        **({"headline_protocol_differs_from_baseline": True}
           if headline_batch not in (None, 8) else {}),
        **({"calib_ratio_vs_ref": calib_ratio} if calib_ratio else {}),
        **({"clouds_per_sec_b8_normalized": cps_b8_norm}
           if cps_b8_norm else {}),
        **cps_rows,
        **out,
        "sections": ",".join(ran),
        **({"sections_timing": timings} if timings else {}),
        **({"stale_cache": True} if any_stale else {}),
        "bench_wall_sec": round(time.time() - t_start, 1),
    }))


if __name__ == "__main__":
    main()
