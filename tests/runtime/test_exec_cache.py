"""Persistent executable cache (runtime/exec_cache.py).

The production gate is TPU-only (CPU AOT embeds host CPU features);
these tests force-enable it on CPU via SFAST_TPU_FORCE_EXEC_CACHE to
exercise the full save → new-process-simulated load → execute path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.runtime.tracing import LazyCompiledFunction


@pytest.fixture()
def exec_cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("SFAST_TPU_FORCE_EXEC_CACHE", "1")
    monkeypatch.setenv("SFAST_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("SFAST_TPU_DISABLE_CACHE", raising=False)
    yield tmp_path


def _wait_for_save(cache_dir, timeout=30.0):
    import glob
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        files = glob.glob(os.path.join(str(cache_dir), "exec_cache", "*.pjrt"))
        if files:
            return files
        time.sleep(0.05)
    return []


def test_save_then_load_skips_compile(exec_cache_env):
    calls = {"n": 0}

    def f(x, y):
        calls["n"] += 1
        return x @ y + 1.0

    a = jnp.ones((8, 8), jnp.float32)
    fn1 = LazyCompiledFunction(f, name="exec_cache_probe")
    out1 = np.asarray(fn1(a, a))
    assert calls["n"] == 1  # traced once
    files = _wait_for_save(exec_cache_env)
    assert files, "executable was not serialized"

    # fresh wrapper = simulated second process (empty in-memory cache)
    fn2 = LazyCompiledFunction(f, name="exec_cache_probe")
    out2 = np.asarray(fn2(a, a))
    assert calls["n"] == 1  # NOT retraced: loaded from disk
    np.testing.assert_array_equal(out1, out2)


def test_distinct_signatures_distinct_entries(exec_cache_env):
    def f(x):
        return x * 2.0

    fn = LazyCompiledFunction(f, name="exec_cache_sig")
    fn(jnp.ones((4,), jnp.float32))
    fn(jnp.ones((8,), jnp.float32))
    files = _wait_for_save(exec_cache_env)
    assert len([p for p in files if "exec_cache_sig" in p]) >= 1
    assert fn.cache_size == 2


def test_corrupt_entry_falls_back(exec_cache_env):
    def f(x):
        return x + 3.0

    a = jnp.ones((4,), jnp.float32)
    fn1 = LazyCompiledFunction(f, name="exec_cache_corrupt")
    fn1(a)
    files = _wait_for_save(exec_cache_env)
    assert files
    for p in files:
        with open(p, "wb") as fh:
            fh.write(b"garbage")
    fn2 = LazyCompiledFunction(f, name="exec_cache_corrupt")
    out = np.asarray(fn2(a))  # must recompile, not crash
    np.testing.assert_allclose(out, 4.0 * np.ones(4))


def test_disabled_by_default_on_cpu(tmp_path, monkeypatch):
    monkeypatch.delenv("SFAST_TPU_FORCE_EXEC_CACHE", raising=False)
    monkeypatch.setenv("SFAST_TPU_CACHE_DIR", str(tmp_path))
    from sfast_tpu.runtime import exec_cache

    if jax.devices()[0].platform not in ("tpu", "axon"):
        assert exec_cache.exec_cache_dir() is None


def test_disabled_on_tunneled_tpu(tmp_path, monkeypatch):
    """A tunneled chip reports platform == "tpu" (the gate that only
    checked the platform string silently left the cache ON over the
    tunnel, round 4) — the backends() registry key is the discriminator."""
    monkeypatch.delenv("SFAST_TPU_FORCE_EXEC_CACHE", raising=False)
    monkeypatch.delenv("SFAST_TPU_DISABLE_CACHE", raising=False)
    monkeypatch.setenv("SFAST_TPU_CACHE_DIR", str(tmp_path))
    import jax._src.xla_bridge as xb

    from sfast_tpu.runtime import exec_cache

    class _FakeTpu:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [_FakeTpu()])
    monkeypatch.setattr(
        xb, "backends", lambda: {"axon": object(), "cpu": object()}
    )
    assert exec_cache._is_tunneled_tpu()
    assert exec_cache.exec_cache_dir() is None

    # same platform string, no tunnel plugin -> cache enabled
    monkeypatch.setattr(xb, "backends", lambda: {"tpu": object()})
    assert not exec_cache._is_tunneled_tpu()
    d = exec_cache.exec_cache_dir()
    assert d is not None and d.startswith(str(tmp_path))


def test_force_overrides_tunnel_gate(tmp_path, monkeypatch):
    monkeypatch.setenv("SFAST_TPU_FORCE_EXEC_CACHE", "1")
    monkeypatch.delenv("SFAST_TPU_DISABLE_CACHE", raising=False)
    monkeypatch.setenv("SFAST_TPU_CACHE_DIR", str(tmp_path))
    from sfast_tpu.runtime import exec_cache

    assert exec_cache.exec_cache_dir() is not None


def test_fingerprint_survives_reclone(tmp_path, monkeypatch):
    """Identical source CONTENT under fresh mtimes (a re-clone / CI
    checkout) must produce the same fingerprint (VERDICT r4 weak #7)."""
    import shutil

    from sfast_tpu.runtime import exec_cache

    pkg_root = os.path.dirname(
        os.path.dirname(os.path.abspath(exec_cache.__file__))
    )
    # compute over the real tree, then over a copy with all-new mtimes
    monkeypatch.setattr(exec_cache, "_FINGERPRINT", None)
    fp_orig = exec_cache._code_fingerprint()

    clone = tmp_path / "sfast_tpu"
    shutil.copytree(
        pkg_root, clone,
        ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.o"),
    )
    for dirpath, _dirs, files in os.walk(clone):
        for f in files:
            os.utime(os.path.join(dirpath, f))  # fresh mtimes

    real_abspath = os.path.abspath

    def fake_abspath(p):
        if p == exec_cache.__file__:
            return str(clone / "runtime" / "exec_cache.py")
        return real_abspath(p)

    monkeypatch.setattr(exec_cache.os.path, "abspath", fake_abspath)
    monkeypatch.setattr(exec_cache, "_FINGERPRINT", None)
    fp_clone = exec_cache._code_fingerprint()
    monkeypatch.setattr(exec_cache, "_FINGERPRINT", None)
    assert fp_clone == fp_orig

    # and a content EDIT must still miss
    victim = clone / "version.py"
    victim.write_text(victim.read_text() + "\n# edited\n")
    monkeypatch.setattr(exec_cache, "_FINGERPRINT", None)
    fp_edited = exec_cache._code_fingerprint()
    monkeypatch.setattr(exec_cache, "_FINGERPRINT", None)
    assert fp_edited != fp_orig


def test_program_env_flags_change_key(tmp_path, monkeypatch):
    """Program-changing SFAST_TPU_* flags must reach the cache key
    (ADVICE r4 medium): flipping SFAST_TPU_CONV_BF16_OUT may not load
    the executable compiled under the other setting."""
    monkeypatch.setenv("SFAST_TPU_FORCE_EXEC_CACHE", "1")
    monkeypatch.setenv("SFAST_TPU_CACHE_DIR", str(tmp_path))
    from sfast_tpu.runtime import exec_cache

    monkeypatch.delenv("SFAST_TPU_CONV_BF16_OUT", raising=False)
    k_off = exec_cache._key_path(str(tmp_path), "probe", ("sig",))
    monkeypatch.setenv("SFAST_TPU_CONV_BF16_OUT", "1")
    k_on = exec_cache._key_path(str(tmp_path), "probe", ("sig",))
    assert k_on != k_off
    monkeypatch.setenv("SFAST_TPU_FUSED_L", "1")
    k_fused = exec_cache._key_path(str(tmp_path), "probe", ("sig",))
    assert k_fused not in (k_on, k_off)

    # cache-plumbing flags must NOT change the key
    monkeypatch.setenv("SFAST_TPU_EXEC_CACHE_SAVE", "0")
    assert exec_cache._key_path(str(tmp_path), "probe", ("sig",)) == k_fused
