"""Packaging for r3m_tpu (counterpart of the reference's ``setup.py:16-31``).

Installs the pure-Python package; the optional native JPEG decode stage
(csrc/) is built separately with `make -C csrc` and discovered at runtime.
"""

from setuptools import find_packages, setup

setup(
    name="r3m_tpu",
    version="0.1.0",
    description=(
        "TPU-native R3M: pretraining visual representations for robot "
        "manipulation from Ego4D human videos + language (JAX/XLA/Pallas)"
    ),
    license="MIT",
    packages=find_packages(include=["r3m_tpu", "r3m_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "numpy",
        "optax",
        "pyyaml",
        "pillow",
        "requests",
    ],
    extras_require={
        "convert": ["torch", "transformers"],  # checkpoint/HF weight import
        "test": ["pytest", "torch", "torchvision", "transformers"],
    },
    entry_points={
        "console_scripts": [
            # the reference is driven by `python train_representation.py`
            # (a repo-root script); installed commands cover the same
            # surfaces for pip-installed users
            "r3m-convert = r3m_tpu.convert:main",
            "r3m-embed = r3m_tpu.embed:cli",
            "r3m-prepare-language = r3m_tpu.prepare_language:main",
            "r3m-verify-parity = r3m_tpu.verify_parity:main",
        ],
    },
)
