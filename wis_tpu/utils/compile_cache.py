"""Persistent XLA compilation cache.

The engine compiles one program per (model, beam, batch-bucket); on TPU
first-compiles are expensive (tens of seconds). Enabling JAX's persistent
compilation cache makes warmup a one-time cost across process restarts —
the TPU analog of CTranslate2 shipping precompiled kernels. Configured
via WIS_COMPILE_CACHE (default ~/.cache/wis_tpu/xla; "off" disables).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("wis_tpu")

_configured = False


def enable_persistent_cache() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    path = os.environ.get(
        "WIS_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "wis_tpu", "xla"),
    )
    if path.lower() in ("off", "none", "0", ""):
        return
    try:
        import jax

        # CPU-forced processes (tests, the multichip dryrun) use a
        # sibling subdirectory: the axon/TPU-attached process writes
        # CPU-AOT entries with platform-specific feature flags
        # (prefer-no-scatter/gather) that a plain CPU process then
        # reloads with a multi-KB cpu_aot_loader mismatch error per
        # entry — loud enough to crowd real output out of a bounded
        # log tail. The TPU program cache stays at the root so warm
        # bench runs keep hitting it.
        plat = str(getattr(jax.config, "jax_platforms", None) or "")
        if plat.split(",")[0] == "cpu":
            path = os.path.join(path, "cpu")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logger.info("COMPILE-CACHE: persistent cache at %s", path)
    except Exception as e:  # noqa: BLE001
        logger.warning("COMPILE-CACHE: could not enable (%s)", e)
