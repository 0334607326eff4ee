"""Persistent XLA compilation cache across processes.

The trainer's startup overhead is dominated by first-shape compiles (the
fused train step, the validation sweep program, the confusion probe — the
dmri soak attributes ~650 s of a 935 s / 2000-iteration run to them,
PARITY.md "Reference-budget soak").  The reference pays the same cost per
torch process (CUDA kernels autotune per shape); JAX can instead persist
serialized executables keyed by HLO hash and reload them in later
processes — e.g. every SLURM array task after the first on a host, or a
relaunched preempted run (the trainer's checkpoint/resume path recompiles
everything without this).

Opt-in two ways:
- ``sp.enable_compilation_cache("/path")`` before the first compile, or
- the ``SP_COMPILATION_CACHE`` environment variable (the package facade
  calls ``enable_compilation_cache_from_env()`` at import).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

ENV_VAR = "SP_COMPILATION_CACHE"


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             min_compile_time_secs: float = 1.0) -> str:
    """Persist compiled executables under ``cache_dir`` (created if needed;
    default ``~/.cache/segmentation_pipeline_tpu/xla``).  Only compiles
    slower than ``min_compile_time_secs`` are written — the expensive
    train-step/sweep programs, not every tiny host-side jit.  Returns the
    directory in use."""
    import jax

    cache_dir = str(cache_dir or Path.home()
                    / ".cache" / "segmentation_pipeline_tpu" / "xla")
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def enable_compilation_cache_from_env() -> Optional[str]:
    """Activate the cache when ``SP_COMPILATION_CACHE`` is set (the value is
    the cache directory; empty value = the default location)."""
    val = os.environ.get(ENV_VAR)
    if val is None:
        return None
    return enable_compilation_cache(val or None)
