"""Lazy compilation — the trace/compile engine.

TPU-native analog of ``lazy_trace`` (reference ``jit/trace_helper.py:33-72``)
fused with the CUDA-graph shape-dispatch cache
(``cuda/graphs.py:16-51``): on TPU a single mechanism — one AOT-compiled
XLA executable per input-shape signature — covers both the "trace once"
and the "capture per shape, replay" roles.

Key properties carried over from the reference:

- **lazy**: nothing compiles until the first call with real inputs
  (``trace_helper.py:42-64``);
- **double-checked locking** around the compile cache
  (``trace_helper.py:34,43-63``);
- **compile-event logging** (``trace_helper.py:50``, ``cuda/graphs.py:37-39``);
- **weights as arguments**: when ``params`` is given, it is passed into
  the jitted function on every call instead of being closed over, so
  in-place weight updates (LoRA hot-swap) never retrace — the analog of
  ``preserve_parameters=True`` (``diffusion_pipeline_compiler.py:35-39``).
  ``freeze=True`` closes params over as compile-time constants instead,
  enabling XLA constant folding at the cost of hot-swap
  (≙ ``enable_jit_freeze``).

The entire ``flat_tensors`` subsystem of the reference (334 LoC,
``utils/flat_tensors.py``) collapses into jax pytrees: arbitrary
args/kwargs structures are natively supported by ``jax.jit``.
"""

import logging
import os
import threading
import weakref
from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax

from sfast_tpu.runtime.signature import arg_signature, call_signature

logger = logging.getLogger(__name__)

_COMPILER_OPTS = None


def tpu_compiler_options():
    """Backend compiler options applied to every AOT compile on TPU.

    ``xla_tpu_enable_deduplicated_calls`` makes the TPU backend emit one
    code body for repeated identical computations instead of one per call
    site.  Measured on the SD1.5 UNet (v5e, 2026-08-18): generated code
    255.1 → 102.9 MB (−60%), fused-pipeline serialized size 374 → 177 MB
    — and the isolated eval is unchanged-to-better (58.2 → 55.8 ms med),
    BUT the 50-step fused loop is ~40 ms/image SLOWER end-to-end
    (1139.4 vs 1096.6 ms, adjacent same-session bench.py A/B) — the
    shared code bodies cost more inside the hot loop than they save.
    Default therefore OFF; opt in with SFAST_TPU_DEDUP_CALLS=1 when
    process warm-start time (binary upload through a ~22 MB/s tunnel,
    see runtime/exec_cache.py) matters more than ~4% latency.  CPU (the
    test backend) rejects TPU-only options, hence the platform gate;
    resolved lazily and cached because ``jax.devices()`` initializes the
    backend.
    """
    global _COMPILER_OPTS
    if _COMPILER_OPTS is None:
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = "unknown"
        opts = {}
        if platform in ("tpu", "axon"):
            if os.environ.get("SFAST_TPU_DEDUP_CALLS", "0") == "1":
                opts["xla_tpu_enable_deduplicated_calls"] = "true"
            # extra backend options, e.g. for option sweeps:
            #   SFAST_TPU_XLA_OPTS="xla_allow_excess_precision=false,..."
            extra = os.environ.get("SFAST_TPU_XLA_OPTS", "")
            for kv in extra.split(","):
                if "=" in kv:
                    k, v = kv.split("=", 1)
                    opts[k.strip()] = v.strip()
        _COMPILER_OPTS = opts
    return _COMPILER_OPTS or None


class _SignatureMemo:
    """Identity-keyed memo for *container* argument signatures.

    Signature hashing is shape/structure-only, but walking a ~700-leaf
    UNet param tree in Python costs ~50 ms per call (measured in the
    SD1.5 e2e profile, 2026-08) — on par with three denoising steps.
    Param trees are passed as the *same object* every call (that is the
    point of preserve_parameters), so memoize their signature by id().

    Entries hold NO strong reference to the container or its arrays —
    a strong ref would pin every superseded weight tree in HBM until LRU
    eviction (up to ``_MAX`` × 1.7 GB of dead UNet weights in a LoRA
    hot-swap serving loop).  Instead each entry stores one *weak*
    reference per leaf; a hit requires every current leaf to be the
    identical live object the signature was computed from.  The leaf
    walk is a C-speed ``tree_leaves`` + an identity scan (~30 µs for a
    700-leaf tree vs ~50 ms for re-hashing), and a freed-and-id-reused
    container can never validate against another tree's leaves.
    """

    _MAX = 64
    # below this leaf count plain hashing is already ~free; skipping tiny
    # containers keeps value-sensitive leaves (0-d numpy scalars hash by
    # VALUE) out of the identity memo in the common small-arg case
    _MIN_LEAVES = 16

    def __init__(self):
        self._entries = {}  # id(container) -> (leaf anchors, sig)
        self._order = []

    @staticmethod
    def _anchor(leaf):
        try:
            return weakref.ref(leaf)
        except TypeError:  # primitives (int/float/str) — compare by value
            return (type(leaf), leaf)

    @staticmethod
    def _anchored(anchor, leaf) -> bool:
        if isinstance(anchor, weakref.ref):
            return anchor() is leaf
        t, v = anchor
        return type(leaf) is t and (v is leaf or v == leaf)

    def _drop(self, key) -> None:
        if self._entries.pop(key, None) is not None:
            self._order.remove(key)

    def signature(self, arg, shape_sensitive: bool):
        if not isinstance(arg, (dict, list, tuple)) or not shape_sensitive:
            return arg_signature(arg, shape_sensitive)
        leaves = jax.tree_util.tree_leaves(arg)
        if len(leaves) < self._MIN_LEAVES:
            return arg_signature(arg, shape_sensitive)
        key = id(arg)
        ent = self._entries.get(key)
        if ent is not None:
            anchors, sig = ent
            if len(anchors) == len(leaves) and all(
                self._anchored(a, l) for a, l in zip(anchors, leaves)
            ):
                return sig
            self._drop(key)  # stale id-reuse or in-place mutation
        sig = arg_signature(arg, shape_sensitive)
        anchors = tuple(self._anchor(l) for l in leaves)
        if len(self._entries) >= self._MAX:
            oldest = self._order.pop(0)
            self._entries.pop(oldest, None)
        self._entries[key] = (anchors, sig)
        self._order.append(key)
        return sig


class LazyCompiledFunction:
    """A callable that lazily AOT-compiles one XLA executable per
    input-shape signature and dispatches to it.

    Steady state (cache hit) is: signature tuple build + dict lookup +
    executable call — the analog of ``tree_copy_ + graph.replay()``
    (reference ``cuda/graphs.py:147-157``), except XLA executables manage
    their own I/O buffers so no static-tensor copy discipline is needed.
    """

    def __init__(
        self,
        fn: Callable,
        *,
        static_argnums: Sequence[int] = (),
        static_argnames: Sequence[str] = (),
        donate_argnums: Sequence[int] = (),
        name: Optional[str] = None,
        mode: str = "aot",  # 'aot' | 'jit'
        in_shardings: Any = None,
        out_shardings: Any = None,
    ):
        self._fn = fn
        self._name = name or getattr(fn, "__name__", "fn")
        self._mode = mode
        self._lock = threading.Lock()
        self._cache = {}
        self._sig_memo = _SignatureMemo()
        self._static_argnums = frozenset(static_argnums)
        self._static_argnames = frozenset(static_argnames)
        jit_kwargs = {}
        if static_argnums:
            jit_kwargs["static_argnums"] = tuple(static_argnums)
        if static_argnames:
            jit_kwargs["static_argnames"] = tuple(static_argnames)
        if donate_argnums:
            jit_kwargs["donate_argnums"] = tuple(donate_argnums)
        if in_shardings is not None:
            jit_kwargs["in_shardings"] = in_shardings
        if out_shardings is not None:
            jit_kwargs["out_shardings"] = out_shardings
        self._jitted = jax.jit(fn, **jit_kwargs)

    @property
    def cache_size(self) -> int:
        return len(self._cache)

    def clear_cache(self) -> None:
        with self._lock:
            self._cache.clear()

    def warmup(self, *args, **kwargs):
        """Compile for this signature without running (≙ CUDA-graph warmup,
        reference ``cuda/graphs.py:87-92``, minus the 3 eager iterations —
        XLA needs none)."""
        self._get_executable(args, kwargs)
        return self

    def _get_executable(self, args, kwargs):
        # per-argument signatures so the big (identity-stable) param
        # trees hit the memo while fresh small args hash normally
        key = (
            tuple(self._sig_memo.signature(a, True) for a in args),
            tuple(
                (k, self._sig_memo.signature(kwargs[k], True))
                for k in sorted(kwargs)
            ),
        )
        exe = self._cache.get(key)
        if exe is None:
            with self._lock:
                exe = self._cache.get(key)
                if exe is None:
                    # second-process warm start: a previously serialized
                    # executable skips trace + lowering + compile entirely
                    from sfast_tpu.runtime import exec_cache

                    exe = exec_cache.load_executable(self._name, key)
                    if exe is None:
                        logger.info(
                            "sfast_tpu: compiling %s for new input signature "
                            "(cache size %d)",
                            self._name,
                            len(self._cache),
                        )
                        lowered = self._jitted.lower(*args, **kwargs)
                        exe = lowered.compile(
                            compiler_options=tpu_compiler_options()
                        )
                        # persist off-thread; first dispatch shouldn't wait
                        # on serialization of a multi-GB-HLO executable
                        threading.Thread(
                            target=exec_cache.save_executable,
                            args=(self._name, key, exe),
                            daemon=True,
                        ).start()
                    self._cache[key] = exe
        return exe

    def __call__(self, *args, **kwargs):
        if self._mode == "jit":
            return self._jitted(*args, **kwargs)
        exe = self._get_executable(args, kwargs)
        # Static args are baked into the executable at lowering time; the
        # AOT call takes only the dynamic (traced) arguments.
        if self._static_argnums or self._static_argnames:
            args = tuple(
                a for i, a in enumerate(args) if i not in self._static_argnums
            )
            kwargs = {
                k: v for k, v in kwargs.items() if k not in self._static_argnames
            }
        return exe(*args, **kwargs)

    def lowered_text(self, *args, **kwargs) -> str:
        """StableHLO of the lowered function — debugging aid (≙ the
        reference's AOT graph printer, ``utils/aot_printer.py:36-44``)."""
        return self._jitted.lower(*args, **kwargs).as_text()


def lazy_jit(
    fn: Optional[Callable] = None,
    *,
    static_argnums: Sequence[int] = (),
    static_argnames: Sequence[str] = (),
    donate_argnums: Sequence[int] = (),
    name: Optional[str] = None,
    mode: str = "aot",
    in_shardings: Any = None,
    out_shardings: Any = None,
) -> Any:
    """Decorator form: ``lazy_jit(fn)`` or ``@lazy_jit(static_argnums=...)``."""
    if fn is None:
        return partial(
            lazy_jit,
            static_argnums=static_argnums,
            static_argnames=static_argnames,
            donate_argnums=donate_argnums,
            name=name,
            mode=mode,
            in_shardings=in_shardings,
            out_shardings=out_shardings,
        )
    return LazyCompiledFunction(
        fn,
        static_argnums=static_argnums,
        static_argnames=static_argnames,
        donate_argnums=donate_argnums,
        name=name,
        mode=mode,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
    )


def freeze_over(fn: Callable, params) -> Callable:
    """Close ``params`` over as compile-time constants (``freeze=True``).

    XLA will constant-fold through the weights; any later weight update
    requires re-wrapping + recompiling — the exact trade the reference
    documents for ``preserve_parameters=False``
    (``diffusion_pipeline_compiler.py:35-43``).
    """

    def frozen(*args, **kwargs):
        return fn(params, *args, **kwargs)

    frozen.__name__ = f"frozen_{getattr(fn, '__name__', 'fn')}"
    return frozen
