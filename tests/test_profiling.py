"""Profiling utilities: trace capture writes an xplane; summary parses it."""

import glob
import os

import pytest

import jax
import jax.numpy as jnp

from r3m_tpu.utils.profiling import op_profile_summary, trace


def test_trace_captures_xplane(tmp_path):
    d = str(tmp_path / "tr")
    with trace(d):
        x = jnp.ones((256, 256))
        y = (x @ x).block_until_ready()
    files = glob.glob(os.path.join(d, "plugins/profile/*/*.xplane.pb"))
    assert files, "no xplane written"

    try:
        rows = op_profile_summary(d, top=3)
    except ImportError:
        pytest.skip("xprof not installed")
    except Exception:
        # CPU xplanes don't always carry the op-profile tables TPU ones do
        pytest.skip("op_profile not derivable from CPU trace")
    assert isinstance(rows, list)


def test_summary_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        op_profile_summary(str(tmp_path / "nope"))
