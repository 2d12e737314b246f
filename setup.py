"""Build for sfast_tpu (pure Python + one C extension).

The native extension is optional at runtime (every caller degrades to a
Python fallback, mirroring the reference's hasattr-gated fused ops).
Build in place with:  python setup.py build_ext --inplace
"""

from setuptools import Extension, find_packages, setup

setup(
    name="sfast_tpu",
    version="0.1.0",
    description="TPU-native diffusion inference compiler (JAX/XLA/Pallas)",
    packages=find_packages(include=["sfast_tpu", "sfast_tpu.*"]),
    ext_modules=[
        Extension(
            "sfast_tpu._C",
            sources=["sfast_tpu/csrc/signature.c"],
            extra_compile_args=["-O3"],
        )
    ],
    python_requires=">=3.10",
    install_requires=["jax", "numpy"],
)
