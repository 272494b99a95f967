"""tools/fetch_assets.py unit tests with a mocked urllib transport
(no egress in this environment — VERDICT r1 item 7)."""

import hashlib
import io
import os
import sys
import urllib.error

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import fetch_assets  # noqa: E402


class FakeResponse(io.BytesIO):
    def __init__(self, data: bytes, status: int = 200):
        super().__init__(data)
        self.status = status


def make_opener(content: bytes, *, support_range: bool = True, log=None):
    def opener(req):
        if log is not None:
            log.append(req)
        rng = req.headers.get("Range")
        if rng and support_range:
            offset = int(rng.split("=")[1].rstrip("-"))
            if offset >= len(content):
                raise urllib.error.HTTPError(
                    req.full_url, 416, "range", {}, None)
            return FakeResponse(content[offset:], status=206)
        return FakeResponse(content, status=200)
    return opener


def test_download_simple(tmp_path):
    data = b"graph-bytes" * 1000
    dest = str(tmp_path / "m.onnx")
    digest = fetch_assets.download_file(
        "http://x/m.onnx", dest, opener=make_opener(data),
        progress=lambda *a, **k: None)
    assert open(dest, "rb").read() == data
    assert digest == hashlib.sha256(data).hexdigest()
    assert not os.path.exists(dest + ".part")


def test_download_resumes_from_part(tmp_path):
    data = b"0123456789" * 500
    dest = str(tmp_path / "m.onnx")
    with open(dest + ".part", "wb") as f:
        f.write(data[:1234])
    log = []
    fetch_assets.download_file(
        "http://x/m.onnx", dest, opener=make_opener(data, log=log),
        progress=lambda *a, **k: None)
    assert open(dest, "rb").read() == data
    assert log[0].headers.get("Range") == "bytes=1234-"


def test_download_restarts_when_range_unsupported(tmp_path):
    data = b"abcdef" * 100
    dest = str(tmp_path / "m.onnx")
    with open(dest + ".part", "wb") as f:
        f.write(b"garbage")
    fetch_assets.download_file(
        "http://x/m.onnx", dest,
        opener=make_opener(data, support_range=False),
        progress=lambda *a, **k: None)
    assert open(dest, "rb").read() == data


def test_download_complete_part_416(tmp_path):
    data = b"whole-file"
    dest = str(tmp_path / "m.onnx")
    with open(dest + ".part", "wb") as f:
        f.write(data)
    fetch_assets.download_file(
        "http://x/m.onnx", dest, opener=make_opener(data),
        progress=lambda *a, **k: None)
    assert open(dest, "rb").read() == data


def test_checksum_mismatch_removes_part(tmp_path):
    data = b"payload"
    dest = str(tmp_path / "m.onnx")
    with pytest.raises(fetch_assets.FetchError, match="sha256 mismatch"):
        fetch_assets.download_file(
            "http://x/m.onnx", dest, opener=make_opener(data),
            expected_sha256="0" * 64, progress=lambda *a, **k: None)
    assert not os.path.exists(dest)
    assert not os.path.exists(dest + ".part")


def test_offline_error_is_actionable(tmp_path):
    def opener(req):
        raise urllib.error.URLError("no route to host")

    with pytest.raises(fetch_assets.FetchError, match="no network egress"):
        fetch_assets.download_file(
            "http://x/m.onnx", str(tmp_path / "m.onnx"), opener=opener,
            progress=lambda *a, **k: None)


def test_fetch_all_layout_and_skip(tmp_path):
    """Full fetch lays files out like the reference assets dir
    (graphs+configs at top level, voice_styles/ subdir) and skips files
    already present."""
    data = b"x"
    out = str(tmp_path / "assets_onnx")
    digests = fetch_assets.fetch_all(
        out, opener=make_opener(data), progress=lambda *a, **k: None)
    assert os.path.exists(os.path.join(out, "tts.json"))
    assert os.path.exists(os.path.join(out, "duration_predictor.onnx"))
    assert os.path.exists(os.path.join(out, "voice_styles", "M1.json"))
    assert len(digests) == 16  # 2 configs + 4 graphs + 10 styles

    def refuse(*a, **k):
        raise AssertionError("no network access should happen on a re-run")

    # second run transfers nothing, but still verifies + reports every
    # pre-existing file (a manifest written from the return value must not
    # lose entries for files that already existed)
    again = fetch_assets.fetch_all(
        out, opener=refuse, progress=lambda *a, **k: None)
    assert again == digests


def test_fetch_all_refetches_stale_existing_file(tmp_path):
    """A pre-existing file whose sha256 mismatches the manifest is stale —
    re-fetch it rather than serving it as current."""
    import hashlib

    data = b"fresh-bytes"
    good = hashlib.sha256(data).hexdigest()
    out = str(tmp_path / "assets_onnx")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "tts.json"), "wb") as f:
        f.write(b"stale-bytes")
    manifest = {"onnx/tts.json": good}
    digests = fetch_assets.fetch_all(
        out, opener=make_opener(data), manifest=manifest,
        progress=lambda *a, **k: None)
    assert digests["tts.json"] == good
    with open(os.path.join(out, "tts.json"), "rb") as f:
        assert f.read() == data


def test_fetch_all_verifies_manifest(tmp_path):
    data = b"graph"
    manifest = {"onnx/tts.json": hashlib.sha256(data).hexdigest()}
    out = str(tmp_path / "a")
    digests = fetch_assets.fetch_all(
        out, opener=make_opener(data), manifest=manifest,
        progress=lambda *a, **k: None)
    assert digests["tts.json"] == manifest["onnx/tts.json"]
