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


def test_raw_and_summary_digest_fixture_tree(tmp_path, monkeypatch):
    """Pin the shared xprof tree-walk on a synthetic op-profile payload.

    CPU traces carry no op metrics (the test above skips), so this is the
    only offline coverage of the parser every audit derives from
    (op_profile_raw; scripts/project_v5p.py consumes the raw rows,
    op_profile_summary digests them to fractions/TF/GB rates).
    """
    import json

    import r3m_tpu.utils.profiling as prof

    # byProgram -> program -> category (depth 2 = where metrics live)
    payload = {
        "byProgram": {
            "children": [
                {
                    "name": "jit_step",
                    "children": [
                        {
                            "name": "convolution fusion",
                            "metrics": {
                                "rawTime": 3e12,  # 3 s in ps
                                "rawFlops": 6e12,
                                "rawBytesAccessedArray": [9e9],
                                "occurrences": 7,
                            },
                        },
                        {
                            "name": "copy-done",
                            "metrics": {"rawTime": 1e12, "occurrences": 2},
                        },
                    ],
                }
            ]
        }
    }

    class _FakeRtd:
        @staticmethod
        def xspace_to_tool_data(files, tool, opts):
            assert tool == "op_profile"
            return json.dumps(payload), None

    d = tmp_path / "tr" / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    (d / "host.xplane.pb").write_bytes(b"")

    import sys
    import types

    xprof = types.ModuleType("xprof")
    convert = types.ModuleType("xprof.convert")
    convert.raw_to_tool_data = _FakeRtd
    xprof.convert = convert
    monkeypatch.setitem(sys.modules, "xprof", xprof)
    monkeypatch.setitem(sys.modules, "xprof.convert", convert)

    rows, total = prof.op_profile_raw(str(tmp_path / "tr"))
    assert total == 4e12
    assert rows[0] == (3e12, 6e12, 9e9, 7, "convolution fusion")
    assert rows[1] == (1e12, 0, 0, 2, "copy-done")

    frac, tf, gb, occ, name = op_profile_summary(str(tmp_path / "tr"), top=1)[0]
    assert name == "convolution fusion" and occ == 7
    assert frac == pytest.approx(0.75)  # 3 of 4 seconds
    assert tf == pytest.approx(2.0)  # 6e12 flops / 3 s / 1e12
    assert gb == pytest.approx(3.0)  # 9e9 bytes / 3 s / 1e9
