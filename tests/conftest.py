"""Test configuration: force an 8-virtual-device CPU mesh.

Multi-chip sharding tests run on host-platform virtual devices
(`--xla_force_host_platform_device_count=8`), the JAX-native way to test an
N-device mesh without hardware.

Note: this environment registers a TPU backend from sitecustomize at
interpreter start (so env-var JAX_PLATFORMS is already consumed); forcing
CPU therefore goes through `jax.config.update`, which still wins because
backends initialize lazily.
"""

import os

# R3M_TPU_TESTS=1 keeps the real backend so the `-m tpu` tier can COMPILE
# the Pallas kernels on the chip (interpret-mode tests are blind to Mosaic
# lowering legality — see tests/test_tpu_kernels.py). Everything else runs
# on the 8-virtual-device CPU mesh below.
_ON_CHIP = os.environ.get("R3M_TPU_TESTS") == "1"

_flags = os.environ.get("XLA_FLAGS", "")
if not _ON_CHIP and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat test sessions skip recompiling the big
# mesh/train-step programs (the bulk of suite wall time). The dir is keyed
# by a host-CPU fingerprint: XLA:CPU AOT results compiled on one machine
# load on another with mismatched ISA features ("machine features don't
# match" — a SIGILL/numeric-drift hazard observed as a real test failure
# when this repo's cache moved between hosts), and the cache key does not
# include the target machine, so we must.
import hashlib  # noqa: E402
import platform  # noqa: E402


def _host_fingerprint() -> str:
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats += " " + platform.processor()
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser(f"~/.cache/r3m_tpu_xla_tests-{_host_fingerprint()}"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
