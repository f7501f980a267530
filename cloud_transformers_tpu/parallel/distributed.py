"""Multi-process (multi-host) initialization.

Replaces the reference's NCCL/DDP rendezvous
(/root/reference/train_classification.py:41-49 and
utils/train_util_distributed.py:91-103) with ``jax.distributed.initialize``:
after initialization, ``jax.devices()`` spans every host's chips and the
GSPMD mesh (parallel/mesh.py) makes gradient all-reduce / SyncBN / metric
reductions fall out of shardings — no per-rank code.

On the CPU backend (tests; the 2-process rendezvous test in
tests/test_multiprocess.py) cross-process collectives need an explicit
implementation — gloo, compiled into jaxlib — selected BEFORE the backend
initializes.  On TPU the fabric provides collectives and the setting is
inert.
"""

import jax


def distributed_init(coordinator, num_processes, process_id):
    """``jax.distributed.initialize`` with CPU collectives enabled.

    Args mirror the reference's --master/--num_nodes/--rank trio; call
    before any JAX computation (the train CLIs call it first thing).
    """
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # older jaxlib without the option — TPU-only path
        pass
    jax.distributed.initialize(coordinator, num_processes, process_id)
