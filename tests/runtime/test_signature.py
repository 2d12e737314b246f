"""Signature hashing tests (≙ reference hash_arg semantics:
shape-sensitive per cuda/graphs.py:225-241, shape-agnostic per
jit/trace_helper.py:109-119)."""

import numpy as np
import jax.numpy as jnp

from sfast_tpu.runtime.signature import arg_signature, call_signature, hash_arg


def test_shape_sensitive_distinguishes_shapes():
    a = jnp.zeros((2, 3))
    b = jnp.zeros((2, 4))
    assert arg_signature(a) != arg_signature(b)
    assert hash_arg(a) != hash_arg(b)


def test_shape_agnostic_ignores_shapes():
    a = jnp.zeros((2, 3))
    b = jnp.zeros((7, 1))
    assert arg_signature(a, shape_sensitive=False) == arg_signature(
        b, shape_sensitive=False
    )


def test_dtype_matters():
    a = jnp.zeros((2, 3), jnp.float32)
    b = jnp.zeros((2, 3), jnp.bfloat16)
    assert arg_signature(a) != arg_signature(b)


def test_numpy_0d_scalar_hashes_by_value():
    # CPU scalars are value-keyed like the reference's special case.
    assert arg_signature(np.float32(1.0)) != arg_signature(np.float32(2.0))


def test_structures():
    s1 = call_signature((jnp.zeros((2,)),), {"k": [1, 2, None]})
    s2 = call_signature((jnp.zeros((2,)),), {"k": [1, 2, None]})
    s3 = call_signature((jnp.zeros((3,)),), {"k": [1, 2, None]})
    assert s1 == s2
    assert s1 != s3
    assert isinstance(hash(s1), int)


def test_primitives_vs_types():
    assert arg_signature(1) != arg_signature(1.0)
    assert arg_signature(True) != arg_signature(1)
    assert arg_signature("x") != arg_signature(b"x")


def test_opaque_objects_hash_by_type():
    class Foo:
        pass

    assert arg_signature(Foo()) == arg_signature(Foo())


def test_dict_order_insensitive():
    a = {"a": 1, "b": 2}
    b = {"b": 2, "a": 1}
    assert arg_signature(a) == arg_signature(b)
