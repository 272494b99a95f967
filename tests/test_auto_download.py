"""TTS(auto_download=True) path (reference py/example_pypi.py:3-4) with the
transport mocked (no egress here)."""

import io
import json
import os
import urllib.error
import urllib.request

import numpy as np
import pytest

from supertonic_tpu import TTS


def _fake_urlopen_factory():
    """Serves plausible bytes for each asset path."""
    cfg = {"ae": {"sample_rate": 16000, "base_chunk_size": 64},
           "ttl": {"chunk_compress_factor": 2, "latent_dim": 8}}
    style = {"style_ttl": {"data": [[[0.5] * 16] * 4], "dims": [1, 4, 16],
                           "type": "float32"},
             "style_dp": {"data": [[[0.25] * 16] * 4], "dims": [1, 4, 16],
                          "type": "float32"}}

    def fake_urlopen(req):
        url = req.full_url
        if url.endswith("tts.json"):
            data = json.dumps(cfg).encode()
        elif url.endswith("unicode_indexer.json"):
            data = json.dumps(list(range(512))).encode()
        elif url.endswith(".onnx"):
            data = b"\x08\x08"  # ir_version only; never parsed by TTS()
        else:  # voice style
            data = json.dumps(style).encode()
        resp = io.BytesIO(data)
        resp.status = 200
        return resp

    return fake_urlopen


def test_auto_download_fetches_and_loads(tmp_path, monkeypatch):
    monkeypatch.setattr(urllib.request, "urlopen", _fake_urlopen_factory())
    target = str(tmp_path / "assets")
    tts = TTS(target, auto_download=True)
    # real config + indexer + styles picked up from the fetched bundle
    assert tts.sample_rate == 16000
    assert os.path.exists(os.path.join(target, "tts.json"))
    assert os.path.exists(os.path.join(target, "voice_styles", "F3.json"))
    st = tts.get_voice_style("F3")
    np.testing.assert_allclose(st.ttl, 0.5)
    # second construction: no network use at all
    monkeypatch.setattr(urllib.request, "urlopen",
                        lambda req: (_ for _ in ()).throw(AssertionError(
                            "network touched on warm start")))
    tts2 = TTS(target, auto_download=True)
    assert tts2.sample_rate == 16000


def test_auto_download_offline_raises_actionable(tmp_path, monkeypatch):
    def offline(req):
        raise urllib.error.URLError("unreachable")

    monkeypatch.setattr(urllib.request, "urlopen", offline)
    with pytest.raises(Exception, match="egress|unreachable"):
        TTS(str(tmp_path / "a"), auto_download=True)
