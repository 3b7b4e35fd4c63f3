"""Persistent XLA compilation cache.

The reconstruction loop compiles a handful of programs per buffer-size
bucket and canvas shape; caching them on disk makes every later round — and
every later *run* — skip those compiles entirely (particularly valuable
behind remote-compile TPU frontends where a single compile can take tens of
seconds). Enabled by every CLI entry point; override the location with
ACEZERO_CACHE_DIR, disable with ACEZERO_CACHE_DIR=0.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

_logger = logging.getLogger(__name__)


def enable_compilation_cache() -> None:
    target = os.environ.get("ACEZERO_CACHE_DIR")
    if target == "0":
        return
    if not target:
        # prefer the repo-local cache directory when present: once populated
        # on a machine (first run pays the ~12-min cold compile wall,
        # measured round 2), later runs on the same hardware/jaxlib reuse
        # the compiled programs for the recipe shapes (480x640 canvas,
        # batch 5120, default head). The directory is gitignored, so fresh
        # clones start cold. Cache keys include backend + jaxlib versions,
        # so a mismatched environment simply misses and recompiles.
        repo_cache = Path(__file__).resolve().parents[2] / ".xla_cache"
        if repo_cache.is_dir() and os.access(repo_cache, os.W_OK):
            target = str(repo_cache)
        else:
            target = str(Path.home() / ".cache" / "acezero_tpu" / "xla")
    try:
        import jax

        Path(target).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _logger.debug("XLA compilation cache at %s", target)
    except Exception as exc:  # noqa: BLE001 — never block startup on cache setup
        _logger.info("Compilation cache unavailable: %s", exc)
