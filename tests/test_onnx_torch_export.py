"""Foreign-exporter end-to-end: torch.onnx.export bytes through our stack.

Every other ONNX fixture in the repo comes from the in-repo protobuf writer
or hand-rolled wire bytes; here every graph byte is produced by the OFFICIAL
torch exporter (TorchScript path, offline), so a mirrored encode/decode bug
in the in-repo writer cannot hide. Torch eager is the oracle — the same role
onnxruntime plays on the real assets (reference py/helper.py:289-306).

Covers: conv/deconv stacks, a hand attention block, GRU/LSTM recurrence,
dynamic batch/length axes, the full 4-graph mini-TTS bundle behind the §2.2
contract through load_onnx_pipeline, and the parity gate's --torch-oracle
mode (green on a matching bundle, red on a corrupted one).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import parity_check  # noqa: E402
import torch_export_bundle as TB  # noqa: E402

from supertonic_tpu.assets.onnx_exec import OnnxSession  # noqa: E402
from supertonic_tpu.assets.onnx_reader import load_onnx  # noqa: E402


def _export_and_run(model, args, tmp_path, name, **export_kw):
    """Export via torch.onnx.export, run our executor, return (got, want)."""
    p = str(tmp_path / f"{name}.onnx")
    n_in = len(args)
    export_kw.setdefault("input_names", [f"in{i}" for i in range(n_in)])
    export_kw.setdefault("output_names", ["out"])
    export_kw.setdefault("dynamic_axes", {})
    TB.export_onnx(model, args, p, **export_kw)
    sess = OnnxSession(p, matmul_precision="float32")
    feeds = {nm: a.numpy() for nm, a in zip(export_kw["input_names"], args)}
    got = sess.run(None, feeds)
    with torch.no_grad():
        want = model(*args)
    if isinstance(want, torch.Tensor):
        want = (want,)
    return [np.asarray(g) for g in got], [w.numpy() for w in want]


def test_conv_stack_foreign_bytes(tmp_path):
    torch.manual_seed(0)
    m = torch.nn.Sequential(
        torch.nn.Conv1d(4, 8, 3, padding=1),
        torch.nn.GELU(),
        torch.nn.GroupNorm(2, 8),
        torch.nn.ConvTranspose1d(8, 4, 4, stride=2),
        torch.nn.Tanh(),
    ).eval()
    got, want = _export_and_run(m, (torch.randn(2, 4, 16),), tmp_path, "conv")
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5, atol=1e-5)


def test_attention_block_foreign_bytes(tmp_path):
    class Attn(torch.nn.Module):
        def __init__(self, d=8):
            super().__init__()
            self.q = torch.nn.Linear(d, d)
            self.k = torch.nn.Linear(d, d)
            self.v = torch.nn.Linear(d, d)
            self.ln = torch.nn.LayerNorm(d)

        def forward(self, x, mask):
            a = self.q(x) @ self.k(x).transpose(1, 2) / 8.0 ** 0.5
            a = a + (mask - 1.0) * 1e4
            return self.ln(x + a.softmax(-1) @ self.v(x))

    torch.manual_seed(1)
    m = Attn().eval()
    x = torch.randn(2, 6, 8)
    mask = torch.ones(2, 1, 6)
    mask[1, :, 4:] = 0.0
    got, want = _export_and_run(m, (x, mask), tmp_path, "attn")
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["gru", "lstm"])
def test_recurrent_foreign_bytes(tmp_path, kind):
    torch.manual_seed(2)
    cls = torch.nn.GRU if kind == "gru" else torch.nn.LSTM
    rnn = cls(input_size=5, hidden_size=7, bidirectional=True).eval()

    class Wrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = rnn

        def forward(self, x):
            return self.rnn(x)[0]

    got, want = _export_and_run(Wrap().eval(), (torch.randn(9, 3, 5),),
                                tmp_path, kind)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5, atol=1e-5)


def test_dynamic_axes_rerun_at_new_shapes(tmp_path):
    """A graph exported with dynamic B/L must execute at shapes other than
    the trace shapes (torch emits Shape/Gather/Concat chains; the executor's
    static partial evaluation has to resolve them per feed shape)."""
    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(6, 6)

        def forward(self, x):
            b = x.shape[0]
            y = self.lin(x).reshape(b, -1)
            return y.reshape(x.shape[0], x.shape[1], 6).softmax(-1)

    torch.manual_seed(3)
    m = Net().eval()
    p = str(tmp_path / "dyn.onnx")
    TB.export_onnx(m, (torch.randn(2, 4, 6),), p, input_names=["x"],
                   output_names=["y"],
                   dynamic_axes={"x": {0: "B", 1: "L"}, "y": {0: "B", 1: "L"}})
    sess = OnnxSession(p, matmul_precision="float32")
    for shape in [(2, 4, 6), (1, 9, 6), (5, 2, 6)]:
        x = torch.randn(*shape)
        (got,) = sess.run(None, {"x": x.numpy()})
        with torch.no_grad():
            want = m(x).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# the full 4-graph bundle
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def torch_bundle(tmp_path_factory):
    d = tmp_path_factory.mktemp("torch_bundle")
    TB.export_bundle(str(d), seed=0)
    return str(d)


def _torch_chain(bundle, ids, mask, style, noise, total_step, dur):
    """Torch-eager composition of the four traced twins (the oracle)."""
    mods = {n: torch.jit.load(os.path.join(bundle, f"{n}.pt")).eval()
            for n in TB.CONTRACT}
    t = lambda a: torch.from_numpy(np.ascontiguousarray(a))  # noqa: E731
    bsz, t_lat = noise.shape[0], noise.shape[2]
    with torch.no_grad():
        emb = mods["text_encoder"](
            t(ids.astype(np.int64)), t(style.ttl), t(mask.astype(np.float32)))
        wl = (dur * TB.SR).astype(np.int64)
        ll = (wl + TB.CHUNK - 1) // TB.CHUNK
        lmask = (np.arange(t_lat)[None, :] < ll[:, None]
                 ).astype(np.float32)[:, None, :]
        xt = t((noise * lmask).astype(np.float32))
        ts = torch.full((bsz,), float(total_step))
        for s in range(total_step):
            xt = mods["vector_estimator"](
                xt, emb, t(style.ttl), t(mask.astype(np.float32)), t(lmask),
                torch.full((bsz,), float(s)), ts)
        return mods["vocoder"](xt).numpy()


def test_bundle_pipeline_matches_torch_eager(torch_bundle):
    """The §2.2 waveform gate on 100% foreign-exporter graph bytes."""
    from supertonic_tpu.assets.onnx_pipeline import load_onnx_pipeline

    pipe = load_onnx_pipeline(torch_bundle)
    rng = np.random.default_rng(3)

    class Style:
        ttl = rng.standard_normal((2, TB.N_STYLE, TB.STYLE_DIM)).astype(np.float32)
        dp = rng.standard_normal((2, TB.N_STYLE, TB.STYLE_DIM)).astype(np.float32)

    texts = ["Hello there, world.", "A second, different sentence!"]
    langs = ["en", "en"]
    ids, mask = pipe.processor(texts, langs)
    mods = torch.jit.load(os.path.join(torch_bundle, "duration_predictor.pt"))
    with torch.no_grad():
        dur = mods(torch.from_numpy(ids.astype(np.int64)),
                   torch.from_numpy(Style.dp),
                   torch.from_numpy(mask.astype(np.float32))).numpy() / 1.05
    t_lat = int((dur.max() * TB.SR + TB.CHUNK - 1) // TB.CHUNK)
    noise = rng.standard_normal((2, TB.C, t_lat)).astype(np.float32)

    wav, dur_got = pipe._infer(texts, langs, Style, total_step=3,
                               speed=1.05, noise=noise)
    np.testing.assert_allclose(dur_got, dur, rtol=1e-5, atol=1e-6)
    want = _torch_chain(torch_bundle, ids, mask, Style, noise, 3, dur)
    assert wav.shape == want.shape == (2, t_lat * TB.CHUNK)
    np.testing.assert_allclose(wav, want, rtol=1e-4, atol=1e-4)


def test_bundle_bucketed_padding_invariant(torch_bundle):
    """Bucket padding on FOREIGN graphs (with their Shape-math chains) must
    not change the trimmed waveform — masks carry the semantics."""
    from supertonic_tpu.assets.onnx_pipeline import load_onnx_pipeline

    rng = np.random.default_rng(5)

    class Style:
        ttl = rng.standard_normal((1, TB.N_STYLE, TB.STYLE_DIM)).astype(np.float32)
        dp = rng.standard_normal((1, TB.N_STYLE, TB.STYLE_DIM)).astype(np.float32)

    plain = load_onnx_pipeline(torch_bundle, seed=11)
    w1, d1 = plain._infer(["Pad me, please."], ["en"], Style, 2)
    bucketed = load_onnx_pipeline(torch_bundle, seed=11, bucketed=True)
    w2, d2 = bucketed._infer(["Pad me, please."], ["en"], Style, 2)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(w1, w2[:, : w1.shape[1]], atol=1e-5)


def test_parity_gate_torch_oracle_green(torch_bundle, capsys):
    rc = parity_check.main(["--assets-dir", torch_bundle,
                            "--torch-oracle", "--total-step", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert '"parity_ok": true' in out


def test_parity_gate_torch_oracle_detects_divergence(torch_bundle, tmp_path,
                                                     capsys):
    """Swap in a differently-seeded vocoder twin: the gate must go red."""
    import shutil

    d = str(tmp_path / "diverged")
    shutil.copytree(torch_bundle, d)
    other = str(tmp_path / "other")
    TB.export_bundle(other, seed=99)
    shutil.copy(os.path.join(other, "vocoder.pt"),
                os.path.join(d, "vocoder.pt"))
    rc = parity_check.main(["--assets-dir", d,
                            "--torch-oracle", "--total-step", "2"])
    out = capsys.readouterr().out
    assert rc == 1
    assert '"parity_ok": false' in out


def test_torch_oracle_session_requires_twin(torch_bundle, tmp_path):
    import shutil

    d = tmp_path / "no_twin"
    d.mkdir()
    shutil.copy(os.path.join(torch_bundle, "vocoder.onnx"),
                d / "vocoder.onnx")
    with pytest.raises(FileNotFoundError, match="--torch-oracle"):
        parity_check.TorchOracleSession(str(d / "vocoder.onnx"))


def test_exported_graphs_have_no_writer_bytes(torch_bundle):
    """Belt-and-braces: the graphs decode with initializers and nodes, and
    the producer recorded in the model proto is pytorch, not this repo."""
    for name in TB.CONTRACT:
        g = load_onnx(os.path.join(torch_bundle, f"{name}.onnx"))
        assert g.nodes and (g.initializers or name == "vocoder")
        assert g.opset and g.opset >= 11
