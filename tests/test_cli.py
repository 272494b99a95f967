"""CLI (serve/cli.py) — flag parity and end-to-end runs in-process.

Runs over the synthetic graph bundle (fast to compile) so the whole
flag → TTS → synthesis → WAV flow is pytest-covered, not just shell-smoked
by tools/smoke_test.sh."""

import os

import numpy as np
import pytest

from test_onnx_pipeline import onnx_dir  # noqa: F401  (module-scoped fixture)

from supertonic_tpu.serve.cli import main, parse_args
from supertonic_tpu.utils import read_wav


def test_flag_parity():
    # reference flag names (py/example_onnx.py:9-70), incl. the aliases
    args = parse_args([
        "--onnx-dir", "/x", "--use-gpu", "--total-step", "3",
        "--speed", "1.2", "--n-test", "2", "--voice-style", "M1",
        "--text", "Hi.", "--lang", "en", "--save-dir", "/tmp/o",
    ])
    assert args.assets_dir == "/x"          # --onnx-dir aliases --assets-dir
    assert args.use_gpu and args.total_step == 3 and args.n_test == 2
    args2 = parse_args(["--assets-dir", "/y"])
    assert args2.assets_dir == "/y" and not args2.use_gpu


def test_assets_dir_env_default(monkeypatch):
    """TTS_ONNX_DIR / TTS_ASSETS_DIR seed the default, like the reference
    service env (py/service.py:20); an explicit flag still wins."""
    monkeypatch.setenv("TTS_ONNX_DIR", "/env/bundle")
    assert parse_args([]).assets_dir == "/env/bundle"
    monkeypatch.setenv("TTS_ASSETS_DIR", "/env/priority")
    assert parse_args([]).assets_dir == "/env/priority"
    assert parse_args(["--onnx-dir", "/flag"]).assets_dir == "/flag"


def test_cli_single_and_batch(onnx_dir, tmp_path, capsys):  # noqa: F811
    out = tmp_path / "wavs"
    main(["--platform", "cpu", "--onnx-dir", onnx_dir, "--n-test", "1",
          "--total-step", "2", "--save-dir", str(out),
          "--text", "One short sentence."])
    wavs = list(out.glob("*.wav"))
    assert len(wavs) == 1
    data, sr = read_wav(str(wavs[0]))
    assert sr == 80 and len(data) > 0  # synthetic bundle tts.json honored
    assert np.isfinite(np.asarray(data, np.float64)).all()

    out2 = tmp_path / "batch"
    main(["--platform", "cpu", "--onnx-dir", onnx_dir, "--batch",
          "--n-test", "1", "--total-step", "2", "--save-dir", str(out2),
          "--text", "First one.", "Second one.",
          "--voice-style", "M1", "F1", "--lang", "en"])
    assert len(list(out2.glob("*.wav"))) == 2

    # --use-gpu warns and continues (reference py/helper.py:324-325)
    out3 = tmp_path / "gpu"
    main(["--platform", "cpu", "--onnx-dir", onnx_dir, "--use-gpu",
          "--n-test", "1", "--total-step", "2", "--save-dir", str(out3),
          "--text", "Gpu flag accepted."])
    assert "GPU execution is not supported" in capsys.readouterr().out
    assert len(list(out3.glob("*.wav"))) == 1


def test_cli_style_text_mismatch(onnx_dir, tmp_path):  # noqa: F811
    with pytest.raises(AssertionError, match="must match"):
        main(["--platform", "cpu", "--onnx-dir", onnx_dir,
              "--save-dir", str(tmp_path),
              "--text", "One.", "Two.", "--voice-style", "M1"])


def test_cli_blended_voice_style(onnx_dir, tmp_path):  # noqa: F811
    out = tmp_path / "blend"
    main(["--platform", "cpu", "--onnx-dir", onnx_dir,
          "--n-test", "1", "--total-step", "2", "--save-dir", str(out),
          "--text", "Blended voice from the command line.",
          "--voice-style", "M1+F1:0.3"])
    wavs = list(out.glob("*.wav"))
    # the synthetic bundle's sample rate is tiny — check non-trivial PCM,
    # not absolute size
    assert len(wavs) == 1 and wavs[0].stat().st_size > 44 + 100


def test_cli_malformed_blend_exits_cleanly(onnx_dir, tmp_path):  # noqa: F811
    with pytest.raises(SystemExit, match="blend"):
        main(["--platform", "cpu", "--onnx-dir", onnx_dir,
              "--save-dir", str(tmp_path), "--text", "x",
              "--voice-style", "M1+F1:abc"])
