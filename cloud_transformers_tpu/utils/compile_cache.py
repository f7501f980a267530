"""Persistent JAX compilation cache, made safe for the axon TPU tunnel.

Reference analog: none — the reference (PyTorch) pays no per-process
compile cost.  Here every process re-traces and re-compiles the Pallas
suite and the model step functions (20-40 s for the classifier train
step), so a persistent on-disk executable cache is the difference
between a ~28 min bench wall and a ~5 min one.

Round-2 history: enabling ``jax_compilation_cache_dir`` made *any* jit
hang on this runtime (commit 0b34e6f reverted it).  Round 4 root-caused
the hang with staged faulthandler probes (tools/compile_cache_probe.py):

  * The hang is NOT in the cache read/write path.  It is caused by two
    **metadata RPCs that the cache key computation performs**:
    ``xla_client.get_topology_for_devices(...).serialize()``
    (jax/_src/cache_key.py ``_hash_accelerator_config``) and
    ``backend.platform_version`` (``_hash_platform``).
  * On the axon tunnel, either RPC returns successfully but wedges the
    tunnel's data plane: every *subsequent* device->host transfer blocks
    forever (faulthandler shows the main thread parked in
    ``array.py:_value``).  Even ``device.device_kind`` — a plain
    attribute read — reproduces the wedge.  Plain jit/execute/readback
    with the cache disabled never touches these RPCs, which is why only
    cache-enabled runs hung.

The workaround below replaces exactly those two hash components with
process-local equivalents (platform name, jax version, device count,
JAX_PLATFORMS).  This weakens the key — two *different* accelerator
generations reachable from the same machine and jax version would share
cache entries — which is acceptable here (single tunnel chip; the cache
dir embeds the device kind reported at client init if available via the
backend's platform string).

**Measured verdict on the axon tunnel (2026-08-19, classifier train
step, B=8x2048): REJECTED.**  With the RPC patch the cache is
*functionally* correct — entries are written (30.8 MB for the train
step), the key is stable across processes (warm run writes no new
entry), and no metadata-RPC hang occurs.  But the warm "hit" costs
**283 s** against a **70 s** plain recompile: the hit path ships the
serialized executable back over the tunnel and loads it server-side
(``deserialize_executable`` is itself a tunnel RPC), which is ~4x
slower than letting the server compile from HLO it already has.  The
write path (``serialize_executable``) was additionally observed to
wedge the tunnel's data plane intermittently — same signature as the
metadata RPCs (subsequent readbacks park in ``array.py:_value``).
Hence: **default OFF when the runtime is an axon tunnel** (detected via
the axon sitecustomize / JAX plugin), opt-in via ``CT_JAX_CACHE=1``.
On a real TPU host (local PJRT, no tunnel) the economics invert —
deserialize is a local read — and the cache defaults ON.

Usage: call :func:`enable_persistent_cache` once, before the first jit.
``CT_JAX_CACHE=0`` forces off, ``CT_JAX_CACHE=1`` forces on.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "ct_jax_compile_cache"
)

_enabled = False


def _patch_cache_key_rpcs() -> None:
    """Replace the two tunnel-wedging metadata RPCs in jax's cache key.

    See module docstring for the root-cause analysis.  Idempotent.
    """
    import jax.version
    from jax._src import cache_key as _ck

    if getattr(_ck, "_ct_axon_safe", False):
        return

    def _safe_hash_platform(hash_obj, backend):
        # backend.platform is a local attribute (read safely by
        # jax.default_backend() in every run); platform_version is the
        # RPC that wedges the tunnel — substitute the jax wheel version,
        # which changes whenever the compiler toolchain here changes.
        _ck._hash_string(hash_obj, backend.platform)
        _ck._hash_string(hash_obj, f"jax-{jax.version.__version__}")

    def _safe_hash_accelerator_config(hash_obj, accelerators):
        # Replaces get_topology_for_devices(...).serialize() and the
        # device_kind fallback — both wedge the axon tunnel's data plane.
        _ck._hash_string(hash_obj, f"ndev-{accelerators.size}")
        _ck._hash_string(hash_obj, os.environ.get("JAX_PLATFORMS", ""))

    _ck._hash_platform = _safe_hash_platform
    _ck._hash_accelerator_config = _safe_hash_accelerator_config
    _ck._ct_axon_safe = True


def _runtime_is_tunnel() -> bool:
    """True when JAX reaches the TPU through the axon tunnel.

    On the tunnel, executable serialize/deserialize are remote RPCs and
    the cache is a measured net loss (283 s hit vs 70 s recompile — see
    module docstring), so it must be opt-in there.
    """
    if os.path.exists(os.path.expanduser("~/.axon_site/sitecustomize.py")):
        return True
    return "axon" in os.environ.get("JAX_PLATFORMS", "").lower()


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 2.0) -> bool:
    """Enable the persistent compilation cache (axon-tunnel safe).

    Returns True if the cache was enabled.  ``min_compile_secs`` skips
    caching trivial executables (their deserialize cost rivals their
    compile cost and they bloat the LRU dir).  Default: on for local
    PJRT runtimes, off on the axon tunnel (override with CT_JAX_CACHE).
    """
    global _enabled
    choice = os.environ.get("CT_JAX_CACHE", "")
    if choice in ("0", "false", "off"):
        return False
    if choice not in ("1", "true", "on") and _runtime_is_tunnel():
        return False
    if _enabled:
        return True

    cache_dir = (cache_dir or os.environ.get("CT_JAX_CACHE_DIR")
                 or _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    except OSError as exc:  # unwritable location: run uncached
        logger.warning("compile cache disabled (cannot create %s: %s)",
                       cache_dir, exc)
        return False

    import jax

    _patch_cache_key_rpcs()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    # Keep JAX from injecting host-local XLA debug-cache paths into the
    # compile options that ride the tunnel.
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # older jax: option absent
        pass
    _enabled = True
    logger.info("persistent compile cache enabled at %s", cache_dir)
    return True
