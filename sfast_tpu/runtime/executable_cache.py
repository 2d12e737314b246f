"""Process-wide executable cache & statistics.

The reference keeps one global trace cache (``trace_helper.py:35``) and
one global CUDA-graph cache (``cuda/graphs.py:18``) plus a per-device
``GraphExecutionEnv`` (mempool/stream/lock singleton,
``cuda/graphs.py:188-222``).  The TPU analog is much lighter — XLA owns
device memory and streams — so this module provides:

- a named registry of :class:`LazyCompiledFunction` objects so tools
  (profiler, tests, cache-warmup scripts) can enumerate what has been
  compiled and for which signatures,
- cache statistics (compiles, hits) for observability,
- the two-level persistence story: in-process executables here;
  on-disk persistence is delegated to JAX's compilation cache enabled in
  ``utils/env.py`` (keyed by HLO fingerprint — effectively
  (architecture, shape bucket), the SURVEY.md §5 feature).
"""

import threading
from typing import Dict, Optional

from sfast_tpu.runtime.tracing import LazyCompiledFunction


class ExecutableCache:
    """Named registry of lazily-compiled executables."""

    def __init__(self):
        self._lock = threading.Lock()
        self._entries: Dict[str, LazyCompiledFunction] = {}

    def register(self, name: str, fn: LazyCompiledFunction) -> LazyCompiledFunction:
        with self._lock:
            self._entries[name] = fn
        return fn

    def get(self, name: str) -> Optional[LazyCompiledFunction]:
        return self._entries.get(name)

    def get_or_create(self, name: str, factory) -> LazyCompiledFunction:
        fn = self._entries.get(name)
        if fn is None:
            with self._lock:
                fn = self._entries.get(name)
                if fn is None:
                    fn = factory()
                    self._entries[name] = fn
        return fn

    def stats(self) -> Dict[str, int]:
        return {name: fn.cache_size for name, fn in self._entries.items()}

    def clear(self) -> None:
        with self._lock:
            for fn in self._entries.values():
                fn.clear_cache()
            self._entries.clear()


_GLOBAL_CACHE = ExecutableCache()


def global_executable_cache() -> ExecutableCache:
    return _GLOBAL_CACHE
