"""Artifact fetch layer: registry, cache behavior, Drive confirm-token flow.

Covers r3m_tpu/fetch.py against the behavior of the reference's download
path (/root/reference/r3m/__init__.py:44-67): same model-id registry and
``~/.r3m/<folder>/{model.pt, config.yaml}`` layout, with the network layer
mocked (zero-egress environment).
"""

import io
import sys
import types

import pytest

from r3m_tpu import fetch
from r3m_tpu.fetch import MODEL_REGISTRY, REPRODUCE_REGISTRY, ensure_artifacts


def test_registries_match_reference_ids():
    """Model-id -> folder mapping parity with r3m/__init__.py:46-57,79-94."""
    assert set(MODEL_REGISTRY) == {"resnet50", "resnet34", "resnet18"}
    assert MODEL_REGISTRY["resnet50"][0] == "r3m_50"
    assert MODEL_REGISTRY["resnet34"][0] == "r3m_34"
    assert MODEL_REGISTRY["resnet18"][0] == "r3m_18"
    assert set(REPRODUCE_REGISTRY) == {"r3m", "r3m_noaug", "r3m_nol1", "r3m_nolang"}
    for folder, mid, cid in list(MODEL_REGISTRY.values()) + list(REPRODUCE_REGISTRY.values()):
        assert mid != cid  # model.pt and config.yaml are distinct artifacts


def test_invalid_model_id_raises_nameerror(tmp_path, monkeypatch):
    """Same error class as the reference's `raise NameError('Invalid Model ID')`."""
    monkeypatch.setenv("R3M_HOME", str(tmp_path))
    with pytest.raises(NameError, match="Invalid Model ID"):
        ensure_artifacts("resnet101")
    with pytest.raises(NameError, match="Invalid Model ID"):
        ensure_artifacts("resnet50", reproduce=True)  # only in the other registry


def test_cached_artifacts_skip_network(tmp_path, monkeypatch):
    """A populated cache must never touch the network (offline-host path)."""
    monkeypatch.setenv("R3M_HOME", str(tmp_path))
    home = tmp_path / "r3m_18"
    home.mkdir()
    (home / "model.pt").write_bytes(b"PK\x03\x04fake")
    (home / "config.yaml").write_text("agent:\n  size: 18\n")

    def boom(*a, **k):
        raise AssertionError("network touched despite populated cache")

    monkeypatch.setattr(fetch, "_drive_download", boom)
    mp, cp = ensure_artifacts("resnet18")
    assert mp == str(home / "model.pt")
    assert cp == str(home / "config.yaml")


def test_partial_cache_fetches_only_missing(tmp_path, monkeypatch):
    monkeypatch.setenv("R3M_HOME", str(tmp_path))
    home = tmp_path / "r3m_50"
    home.mkdir()
    (home / "model.pt").write_bytes(b"PK\x03\x04fake")
    calls = []

    def fake_download(file_id, dest):
        calls.append((file_id, dest))
        with open(dest, "w") as f:
            f.write("agent: {}\n")

    monkeypatch.setattr(fetch, "_drive_download", fake_download)
    mp, cp = ensure_artifacts("resnet50")
    assert [c[1] for c in calls] == [cp]  # only config.yaml fetched
    assert calls[0][0] == MODEL_REGISTRY["resnet50"][2]


def test_offline_failure_names_manual_path(tmp_path, monkeypatch):
    """Zero-egress hosts get an actionable error naming the cache dir."""
    monkeypatch.setenv("R3M_HOME", str(tmp_path))

    def fail(*a, **k):
        raise OSError("no route to host")

    monkeypatch.setattr(fetch, "_drive_download", fail)
    with pytest.raises(RuntimeError, match=r"not cached at .*r3m_34.*manually"):
        ensure_artifacts("resnet34")
    # a failed fetch must not leave a poisoned/partial cache entry
    assert not (tmp_path / "r3m_34" / "model.pt").exists()


class _FakeResponse:
    def __init__(self, body: bytes, cookies=None):
        self._buf = io.BytesIO(body)  # shared position: iter_content resumes,
        self.cookies = cookies or {}  # matching real requests stream semantics

    def raise_for_status(self):
        pass

    def iter_content(self, chunk):
        while True:
            c = self._buf.read(chunk)
            if not c:
                return
            yield c


def _install_fake_requests(monkeypatch, responses, log):
    """Install a minimal `requests` module whose Session.get pops `responses`."""

    class _Session:
        def get(self, url, params=None, stream=False, timeout=None):
            log.append({"url": url, **dict(params or {})})
            return responses.pop(0)

    mod = types.ModuleType("requests")
    mod.Session = _Session
    monkeypatch.setitem(sys.modules, "requests", mod)


def test_drive_download_direct_payload(tmp_path, monkeypatch):
    """Small public files stream directly; peeked bytes are not dropped."""
    body = b"PK\x03\x04" + bytes(range(256)) * 8
    log = []
    _install_fake_requests(monkeypatch, [_FakeResponse(body)], log)
    dest = tmp_path / "model.pt"
    fetch._drive_download("FILEID", str(dest))
    assert dest.read_bytes() == body
    assert not dest.with_suffix(".pt.part").exists()
    assert log[0]["id"] == "FILEID" and "confirm" not in log[0]


def test_drive_download_cookie_confirm_token(tmp_path, monkeypatch):
    """The gdown-style download_warning cookie triggers a confirmed re-GET."""
    body = b"\x80\x02legacy-pickle-payload"
    log = []
    _install_fake_requests(
        monkeypatch,
        [
            _FakeResponse(b"<html>scan warning</html>", cookies={"download_warning_x": "tok123"}),
            _FakeResponse(body),
        ],
        log,
    )
    dest = tmp_path / "model.pt"
    fetch._drive_download("FILEID", str(dest))
    assert dest.read_bytes() == body
    assert log[1]["confirm"] == "tok123"


def test_drive_download_inline_confirm_marker(tmp_path, monkeypatch):
    """Token embedded in the interstitial HTML body (no cookie) is honored,
    and the peeked interstitial bytes are NOT written to the artifact."""
    interstitial = b"<html><a href=\"/uc?export=download&confirm=t0k-_A&id=F\">Download anyway</a></html>"
    body = b"PK\x03\x04real-zip-bytes"
    log = []
    _install_fake_requests(monkeypatch, [_FakeResponse(interstitial), _FakeResponse(body)], log)
    dest = tmp_path / "model.pt"
    fetch._drive_download("FILEID", str(dest))
    assert dest.read_bytes() == body
    assert log[1]["confirm"] == "t0k-_A"


def test_drive_download_interstitial_never_committed(tmp_path, monkeypatch):
    """A quota page with no token anywhere must raise and leave no file."""
    log = []
    _install_fake_requests(
        monkeypatch, [_FakeResponse(b"<html>Quota exceeded for this file</html>")], log
    )
    dest = tmp_path / "model.pt"
    with pytest.raises(RuntimeError, match="non-artifact payload"):
        fetch._drive_download("FILEID", str(dest))
    assert not dest.exists()
    assert not (tmp_path / "model.pt.part").exists()


def test_cache_home_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("R3M_HOME", str(tmp_path / "alt"))
    assert fetch.cache_home() == str(tmp_path / "alt")
    monkeypatch.delenv("R3M_HOME")
    assert fetch.cache_home().endswith("/.r3m")


def test_drive_download_modern_form_interstitial(tmp_path, monkeypatch):
    """The current Drive large-file flow: an HTML form targeting
    drive.usercontent.google.com with hidden confirm/uuid inputs (what
    today's gdown implements). The fetch must submit the form's action URL
    with ALL its hidden params and write only the real payload."""
    interstitial = (
        b"<html><body>"
        b"<form id=\"download-form\" "
        b"action=\"https://drive.usercontent.google.com/download\" method=\"get\">"
        b"<input type=\"hidden\" name=\"id\" value=\"FILEID\">"
        b"<input type=\"hidden\" name=\"export\" value=\"download\">"
        b"<input type=\"hidden\" name=\"confirm\" value=\"t\">"
        b"<input type=\"hidden\" name=\"uuid\" value=\"abc-123\">"
        b"</form></body></html>"
    )
    body = b"PK\x03\x04zip-payload-bytes"
    log = []
    _install_fake_requests(
        monkeypatch, [_FakeResponse(interstitial), _FakeResponse(body)], log
    )
    dest = tmp_path / "model.pt"
    fetch._drive_download("FILEID", str(dest))
    assert dest.read_bytes() == body
    assert log[1]["url"] == "https://drive.usercontent.google.com/download"
    assert log[1]["confirm"] == "t" and log[1]["uuid"] == "abc-123"
    assert log[1]["id"] == "FILEID"


def test_parse_download_form_ignores_non_download_forms():
    """A search-box form without confirm/uuid params must not be mistaken
    for the download form (the legacy inline-confirm fallback handles it)."""
    html = (
        b"<html><form action=\"/search\">"
        b"<input name=\"q\" value=\"\"></form>"
        b"<a href=\"/uc?export=download&confirm=tok9&id=F\">Download anyway</a>"
        b"</html>"
    )
    assert fetch._parse_download_form(html) is None
