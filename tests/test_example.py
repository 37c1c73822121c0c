"""The smoke script (example.py) — counterpart of the reference's
``r3m/example.py`` executable check: encode one random 500x500 image and
print the [1, 2048] shape. On hosts without the cached Drive artifacts the
script must fall back to a random-init encoder and still exercise the full
device-side Resize(256)+CenterCrop(224)+normalize+encode path."""

import pytest

pytestmark = pytest.mark.slow


def test_example_script_offline_fallback(capsys, monkeypatch):
    import r3m_tpu

    import example

    def _no_network(_modelid):
        raise RuntimeError("offline test host")

    monkeypatch.setattr(r3m_tpu, "load_r3m", _no_network)
    example.main()
    out = capsys.readouterr().out
    assert "using random init" in out
    assert "(1, 2048)" in out
