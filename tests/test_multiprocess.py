"""Multi-process (multi-host) execution test.

Runs the REAL train CLI as two separate OS processes that rendezvous via
``jax.distributed.initialize`` on a localhost coordinator (the reference's
NCCL rendezvous, /root/reference/train_classification.py:41-49 and
utils/train_util_distributed.py:91-103), with 2 virtual CPU devices per
process, and asserts the per-step training losses equal a single-process
4-device run: the DataLoader's per-process index sharding
(DistributedSampler equivalent) plus ``make_array_from_process_local_data``
assemble the SAME global batch either way, so losses match up to summation
order.

Children run hermetically (``python -S`` + scrubbed env) so the machine's
sitecustomize TPU plugin cannot leak in — same recipe as
``__graft_entry__.dryrun_multichip``.
"""

import json
import os
import socket
import subprocess
import sys
import sysconfig

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = """
experiment:
    root: '{root}/exp'
    writer_root: '{root}/runs'
data:
    batch_size: {batch}
    num_workers: 0
    num_points: 64
model:
    name: 'scanobject_classifier'
    n_classes: 15
    model_dim: 64
    repeats: 1
    pool_heads: 2
    pool_feature_dims: [4, 4]
    pool_sizes: [4, 8]
    trunk_width: 4
    class_dim: 64
    mask_dim: 32
    stage_plan: [[[4, 4], [2, 2], [16, 8], [2, 3]]]
train:
    seg_weight: 0.5
    show_each: 1
    save: false
    num_epochs: 1
    optimizer:
        type: 'Adam'
        lr: 0.001
"""


def _hermetic_env(n_devices):
    drop = ("PALLAS_AXON", "AXON_", "TPU_", "LIBTPU", "JAX_", "PJRT_",
            "XLA_")
    env = {k: v for k, v in os.environ.items() if not k.startswith(drop)}
    keep = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO, sysconfig.get_path("purelib")] + keep)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    return env


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _losses(writer_root, exp):
    path = os.path.join(writer_root, "runs", exp, "metrics.jsonl")
    out = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "train/loss" in rec:
                out[rec["step"]] = rec["train/loss"]
    return out


def _run(args, env, log_path, timeout=900):
    with open(log_path, "w") as log:
        proc = subprocess.Popen(
            [sys.executable, "-S",
             os.path.join(REPO, "train_classification.py")] + args,
            env=env, cwd=REPO, stdout=log, stderr=subprocess.STDOUT)
    return proc


@pytest.mark.slow
def test_two_process_rendezvous_matches_single(tmp_path):
    steps = 3
    cfg_multi = tmp_path / "multi.yaml"
    # per-process batch 4 -> global batch 8, same as the single-process run
    cfg_multi.write_text(CONFIG.format(root=str(tmp_path / "m"), batch=4))
    cfg_single = tmp_path / "single.yaml"
    cfg_single.write_text(CONFIG.format(root=str(tmp_path / "s"), batch=8))

    port = _free_port()
    base = ["--synthetic", "--steps", str(steps)]
    procs = [
        _run(["mp", "-c", str(cfg_multi)] + base
             + ["--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid)],
             _hermetic_env(2), str(tmp_path / f"mp{pid}.log"))
        for pid in (0, 1)
    ]
    rcs = [p.wait(timeout=900) for p in procs]
    for pid, rc in enumerate(rcs):
        assert rc == 0, (tmp_path / f"mp{pid}.log").read_text()[-4000:]

    sp = _run(["sp", "-c", str(cfg_single)] + base, _hermetic_env(4),
              str(tmp_path / "sp.log"))
    assert sp.wait(timeout=900) == 0, \
        (tmp_path / "sp.log").read_text()[-4000:]

    multi = _losses(str(tmp_path / "m"), "mp")
    single = _losses(str(tmp_path / "s"), "sp")
    assert set(multi) == set(single) and len(multi) == steps
    for step in sorted(single):
        # same global batch either way; only the within-batch summation
        # order differs between the shardings
        assert np.isclose(multi[step], single[step], atol=1e-4), (
            step, multi[step], single[step])
