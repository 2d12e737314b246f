from sfast_tpu.profile.auto_profiler import AutoProfiler, IterationProfiler
from sfast_tpu.profile.cprofile import with_cProfile

__all__ = ["AutoProfiler", "IterationProfiler", "with_cProfile"]
