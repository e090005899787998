import os as _os

import jax as _jax

# Persistent compilation cache: kernel shapes compile once per machine.
# Compiles through this environment's remote-compile service are slow and
# high-variance (200-500s worst case), so cache hits are load-bearing.
try:
    _cache_dir = _os.environ.get(
        "C3POA_JAX_CACHE", _os.path.expanduser("~/.cache/c3poa_jax"))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is an optimization only
    pass

from .sw_profile import start_profile_batch
from .smooth import smooth3_batch
from .peaks import call_peaks_batch
from .banded import banded_align_batch
