"""tools/parity_check.py — the executable BASELINE parity gate.

No onnxruntime and no real assets exist in this environment, so the ORT
oracle is stood in for by a stub module whose InferenceSession wraps our own
OnnxSession — exercising the tool's full module-by-module + injected-noise
flow. The fused-backend self-check runs for real.
"""

import os
import sys
import types

import numpy as np

from test_onnx_pipeline import onnx_dir  # noqa: F401  (module-scoped fixture)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import parity_check  # noqa: E402


def test_self_check_passes(onnx_dir, capsys):  # noqa: F811
    rc = parity_check.main(
        ["--assets-dir", onnx_dir, "--total-step", "2", "--skip-ort"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    import json

    summary = json.loads(out[-1])
    assert summary["parity_ok"] is True
    assert summary["stages"] >= 6  # wav + dur per text


def test_full_gate_with_stub_ort(onnx_dir, capsys, monkeypatch):  # noqa: F811
    """Stubbed onnxruntime (wrapping our executor) drives the per-module
    comparison path end-to-end: identical graphs => parity_ok."""
    from supertonic_tpu.assets.onnx_exec import OnnxSession

    stub = types.ModuleType("onnxruntime")

    class InferenceSession:
        def __init__(self, path, providers=None):
            self._s = OnnxSession(path, matmul_precision="float32")

        def run(self, names, feeds):
            return self._s.run(names, feeds)

    stub.InferenceSession = InferenceSession
    monkeypatch.setitem(sys.modules, "onnxruntime", stub)

    rc = parity_check.main(
        ["--assets-dir", onnx_dir, "--total-step", "2"])
    assert rc == 0
    import json

    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    stages = {r.get("stage") for r in lines if "stage" in r}
    assert {"duration_predictor", "text_encoder", "vocoder",
            "seeded_end_to_end_wav", "full_own_chain_wav",
            "fused_vs_pipeline_wav"} <= stages
    assert lines[-1]["parity_ok"] is True


def test_gate_fails_on_divergent_graph(onnx_dir, tmp_path, capsys,
                                       monkeypatch):  # noqa: F811
    """A reference whose vocoder differs must FAIL the gate (the tool can
    actually detect disagreement, not just print)."""
    import shutil

    from supertonic_tpu.assets import onnx_reader as R
    from supertonic_tpu.assets.onnx_exec import OnnxSession

    ref_dir = tmp_path / "ref"
    shutil.copytree(onnx_dir, ref_dir)
    # reference vocoder: same contract, different math (extra gain)
    w = np.load(os.path.join(onnx_dir, "weights.npy"),
                allow_pickle=True).item()
    BASE_CHUNK, CCF = 4, 2
    node = [R.encode_node("ConvTranspose", ["latent", "w_voc"], ["up"],
                          name="n0",
                          attrs={"strides": [BASE_CHUNK * CCF],
                                 "kernel_shape": [BASE_CHUNK * CCF]}),
            R.encode_node("Mul", ["up", "gain"], ["g"], name="n1"),
            R.encode_node("Squeeze", ["g", "ax1"], ["sq"], name="n2"),
            R.encode_node("Tanh", ["sq"], ["wav_tts"], name="n3")]
    inits = [R.encode_tensor("w_voc", w["w_voc"]),
             R.encode_tensor("gain", np.float32(1.5)),
             R.encode_tensor("ax1", np.asarray([1], np.int64))]
    vi_in = [R.encode_value_info("latent", np.float32, ("B", CCF * 3, "T"))]
    vi_out = [R.encode_value_info("wav_tts", np.float32, ("B", "W"))]
    (ref_dir / "vocoder.onnx").write_bytes(
        R.encode_model("g", node, inits, vi_in, vi_out))

    stub = types.ModuleType("onnxruntime")

    class InferenceSession:
        def __init__(self, path, providers=None):
            # the "reference" loads from ref_dir, our executor from onnx_dir
            self._s = OnnxSession(str(ref_dir / os.path.basename(path)),
                                  matmul_precision="float32")

        def run(self, names, feeds):
            return self._s.run(names, feeds)

    stub.InferenceSession = InferenceSession
    monkeypatch.setitem(sys.modules, "onnxruntime", stub)

    rc = parity_check.main(["--assets-dir", onnx_dir, "--total-step", "2"])
    assert rc == 1
