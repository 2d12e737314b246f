"""Native (_C) vs Python signature parity — the C path runs on every
compiled-model dispatch, so it must agree with the Python semantics
byte-for-byte."""

import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.runtime import signature as S

try:
    from sfast_tpu import _C
except ImportError:  # conftest's ensure_native() failed to build
    _C = None

if _C is None:
    import os

    if os.environ.get("SFAST_TPU_REQUIRE_NATIVE", "0") == "1":
        pytest.fail(
            "SFAST_TPU_REQUIRE_NATIVE=1 but sfast_tpu._C is not importable "
            "and the in-place build failed"
        )
    pytest.skip("sfast_tpu._C not built", allow_module_level=True)


CASES = [
    1,
    1.5,
    True,
    None,
    "x",
    b"y",
    jnp.zeros((2, 3)),
    jnp.zeros((2, 3), jnp.bfloat16),
    np.float32(2.5),
    np.zeros(()),
    [1, 2, (3, None)],
    {"b": jnp.ones((1,)), "a": 2},
    {"nested": {"x": [jnp.zeros((4,)), "s"]}},
]


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
@pytest.mark.parametrize("shape_sensitive", [True, False])
def test_c_matches_python(case, shape_sensitive):
    py = S.arg_signature(case, shape_sensitive)
    c = _C.arg_signature(case, shape_sensitive=shape_sensitive)
    assert py == c, (py, c)
    assert hash(py) == hash(c)


def test_call_signature_parity():
    args = (jnp.zeros((2,)), 5)
    kwargs = {"k": [1.0, jnp.ones((3, 3))]}
    py = (
        S.arg_signature(args, True),
        S.arg_signature(kwargs, True),
    )
    c = _C.call_signature(args, kwargs, shape_sensitive=True)
    assert py == c


def test_opaque_objects():
    class Foo:
        pass

    assert S.arg_signature(Foo()) == _C.arg_signature(Foo())


def test_dataclass_by_field_values():
    """Dataclasses hash by field VALUES in both paths — two instances
    differing only in a field must get different dispatch keys (a stale
    executable would otherwise be reused; ADVICE round-1 finding)."""
    import dataclasses

    @dataclasses.dataclass
    class Knobs:
        a: int
        b: float
        arr: object = None

    k1 = Knobs(1, 2.0, jnp.zeros((2,)))
    k2 = Knobs(1, 3.0, jnp.zeros((2,)))
    for shape_sensitive in (True, False):
        py1 = S.arg_signature(k1, shape_sensitive)
        c1 = _C.arg_signature(k1, shape_sensitive=shape_sensitive)
        assert py1 == c1, (py1, c1)
        assert _C.arg_signature(k2) != c1
    # nested inside args/kwargs through call_signature
    py = (S.arg_signature((k1,), True), S.arg_signature({"k": k2}, True))
    assert _C.call_signature((k1,), {"k": k2}) == py


def test_dispatch_uses_native(monkeypatch):
    """call_signature routes through _C when present."""
    called = {}

    def spy(*a, **k):
        called["yes"] = True
        return ("sig", "sig")

    monkeypatch.setattr(S, "_C", type("M", (), {"call_signature": staticmethod(spy)}))
    S.call_signature((1,), {})
    assert called.get("yes")
