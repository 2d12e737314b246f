"""Utility module tests (profilers, debug printers, image helpers,
term_image, memory_format, compute_precision)."""

import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.profile import AutoProfiler, IterationProfiler, with_cProfile
from sfast_tpu.utils.debug import count_ops, print_jaxpr
from sfast_tpu.utils.image import (
    denormalize_to_uint8,
    preprocess_control_image,
    preprocess_image,
)
from sfast_tpu.utils.memory_format import nchw_to_nhwc, nhwc_to_nchw
from sfast_tpu.utils.compute_precision import (
    high_compute_precision,
    low_compute_precision,
)
from sfast_tpu.utils.term_image import image_to_ansi


def test_auto_profiler_tracks():
    msgs = []
    with AutoProfiler("x", echo=msgs.append) as p:
        p.track(jnp.ones((4,)) * 2)
    assert p.elapsed is not None and p.elapsed >= 0
    assert "x" in msgs[0]


def test_iteration_profiler():
    prof = IterationProfiler()
    for i in range(3):
        prof(None, i, None, {"latents": jnp.ones((2,))})
    assert len(prof.times) == 2
    assert prof.iterations_per_second > 0
    assert "it/s" in prof.summary()


def test_with_cprofile_runs():
    out = []

    @with_cProfile(echo=out.append, top=5)
    def f(x):
        return x + 1

    assert f(1) == 2
    assert out and "cumulative" in out[0]


def test_count_ops():
    counts = count_ops(lambda x: jnp.sin(x) + jnp.cos(x), jnp.ones((2,)))
    assert counts.get("sin") == 1 and counts.get("cos") == 1


def test_print_jaxpr(capsys):
    print_jaxpr(lambda x: x * 2, jnp.ones((2,)))
    assert "mul" in capsys.readouterr().out


def test_image_roundtrip():
    img = np.random.RandomState(0).randint(0, 255, (1, 8, 8, 3), np.uint8)
    f = preprocess_image(img)
    assert float(f.min()) >= -1 and float(f.max()) <= 1
    back = denormalize_to_uint8(f)
    np.testing.assert_allclose(np.asarray(back), img, atol=1)

    c = preprocess_control_image(img)
    assert float(c.min()) >= 0 and float(c.max()) <= 1


def test_memory_format_roundtrip():
    x = jnp.arange(24.0).reshape(1, 2, 3, 4)  # NCHW
    y = nchw_to_nhwc(x)
    assert y.shape == (1, 3, 4, 2)
    np.testing.assert_array_equal(np.asarray(nhwc_to_nchw(y)), np.asarray(x))


def test_precision_contexts():
    with low_compute_precision():
        a = jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8)))
    with high_compute_precision():
        b = jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_term_image_ansi():
    img = np.zeros((16, 16, 3), np.uint8)
    img[:8] = [255, 0, 0]
    s = image_to_ansi(img, max_width=8)
    assert "▀" in s and "38;2;255;0;0" in s
    assert s.endswith("\x1b[0m")
