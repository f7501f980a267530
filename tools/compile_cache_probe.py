#!/usr/bin/env python
"""Root-cause probe for the persistent-compilation-cache hang (round-2
commit 0b34e6f reverted the cache after "even a trivial jit hangs"; the
round-3 VERDICT asked for the hang to be root-caused or the cache
re-attempted behind a watchdog).

Runs a trivial jit with ``jax_compilation_cache_dir`` enabled inside this
process, with a faulthandler watchdog that dumps every thread's stack if we
stall, so the blocking frame is captured instead of inferred.

Usage:
  python tools/compile_cache_probe.py [--platform cpu|axon] [--dir DIR]
        [--min-time 0] [--timeout 120] [--second-run]
"""

import argparse
import faulthandler
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dir", default="/tmp/ct_jax_cache_probe")
    ap.add_argument("--min-time", type=float, default=0.0,
                    help="jax_persistent_cache_min_compile_time_secs")
    ap.add_argument("--timeout", type=float, default=120.0)
    ap.add_argument("--second-run", action="store_true",
                    help="expect a cache HIT (measure read path)")
    ap.add_argument("--xla-caches", default=None,
                    help="value for jax_persistent_cache_enable_xla_caches "
                         "('none' disables the injected XLA debug options; "
                         "default keeps JAX's default, which injects "
                         "xla_gpu_per_fusion_autotune_cache_dir)")
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    # watchdog: dump all thread stacks if we exceed the budget
    faulthandler.dump_traceback_later(args.timeout, exit=True)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", args.dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      args.min_time)
    # cache everything regardless of backend heuristics
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    if args.xla_caches is not None:
        jax.config.update("jax_persistent_cache_enable_xla_caches",
                          args.xla_caches)

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    t0 = time.perf_counter()
    x = jnp.ones((256, 256))
    y = jax.jit(lambda a: a @ a + 1.0)(x)
    y.block_until_ready()
    t1 = time.perf_counter()
    print(f"first jit ok in {t1 - t0:.2f}s sum={float(y.sum()):.1f}",
          flush=True)

    # a second, distinct computation to force another cache write
    z = jax.jit(lambda a: jnp.tanh(a) * 2.0)(x)
    z.block_until_ready()
    print(f"second jit ok in {time.perf_counter() - t1:.2f}s", flush=True)

    entries = []
    if os.path.isdir(args.dir):
        for root, _dirs, files in os.walk(args.dir):
            entries += [os.path.join(root, f) for f in files]
    print(f"cache entries: {len(entries)}", flush=True)
    for e in entries[:5]:
        print(f"  {os.path.relpath(e, args.dir)} "
              f"({os.path.getsize(e)} bytes)", flush=True)
    faulthandler.cancel_dump_traceback_later()
    print("PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
