from sfast_tpu.runtime.signature import arg_signature, hash_arg
from sfast_tpu.runtime.tracing import lazy_jit, LazyCompiledFunction
from sfast_tpu.runtime.executable_cache import ExecutableCache

__all__ = [
    "arg_signature",
    "hash_arg",
    "lazy_jit",
    "LazyCompiledFunction",
    "ExecutableCache",
]
