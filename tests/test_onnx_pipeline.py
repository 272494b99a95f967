"""End-to-end test of the ONNX-backend pipeline (OnnxPipeline).

Four synthetic graphs are written with the §2.2 I/O contract of the real
reference models (names/shapes per SURVEY.md §2.2; reference
py/helper.py:177-215) and run through ``load_onnx_pipeline``; outputs are
checked against an independent numpy/torch evaluation of the same math.
This proves the executor backend honors the exact call-site contract, so
the real graphs slot in unchanged the day the assets are mountable.
"""

import json
import os

import numpy as np
import pytest

from supertonic_tpu.assets import onnx_reader as R
from supertonic_tpu.assets.onnx_pipeline import load_onnx_pipeline

F32, I64 = np.float32, np.int64

SR = 80            # tiny sample rate so latent grids stay small
BASE_CHUNK = 4
CCF = 2
LDIM = 3
C = LDIM * CCF     # latent channels
E = 5              # text_emb channels
V = 128            # vocab


def _model(nodes, inits, inputs, outputs):
    node_bufs = [R.encode_node(op, list(i), list(o), name=f"n{k}", attrs=a)
                 for k, (op, i, o, a) in enumerate(nodes)]
    init_bufs = [R.encode_tensor(k, np.asarray(v)) for k, v in inits.items()]
    in_vis = [R.encode_value_info(n, dt, sh) for n, dt, sh in inputs]
    out_vis = [R.encode_value_info(n, dt, sh) for n, dt, sh in outputs]
    return R.encode_model("g", node_bufs, init_bufs, in_vis, out_vis)


@pytest.fixture(scope="module")
def onnx_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("onnx_assets")
    rng = np.random.default_rng(7)
    w = {
        "emb": rng.standard_normal((V, E)).astype(F32) * 0.3,
        "w_conv": rng.standard_normal((C, C, 3)).astype(F32) * 0.2,
        "w_proj": rng.standard_normal((E, C)).astype(F32) * 0.2,
        "w_voc": rng.standard_normal((C, 1, BASE_CHUNK * CCF)).astype(F32) * 0.3,
    }
    np.save(d / "weights.npy", w, allow_pickle=True)

    # -- duration_predictor.onnx (mask-correct: padding-invariant like the
    #    real graphs, which see batch-max padding — py/helper.py:124-131) ---
    dp = _model(
        [("ReduceSum", ["text_mask"], ["msum"], {"axes": [1, 2], "keepdims": 0}),
         ("Mul", ["msum", "c_dur"], ["t0"], None),
         ("Cast", ["text_ids"], ["idsf"], {"to": 1}),
         ("Squeeze", ["text_mask", "ax1"], ["mask2"], None),
         ("Mul", ["idsf", "mask2"], ["idmasked"], None),
         ("ReduceSum", ["idmasked"], ["idsum"], {"axes": [1], "keepdims": 0}),
         ("Div", ["idsum", "msum"], ["idm"], None),  # masked mean
         ("Mul", ["idm", "c_id"], ["t1"], None),
         ("ReduceMean", ["style_dp"], ["sm"], {"axes": [1, 2], "keepdims": 0}),
         ("Mul", ["sm", "c_s"], ["t2"], None),
         ("Add", ["t0", "t1"], ["t01"], None),
         ("Add", ["t01", "t2"], ["t012"], None),
         ("Add", ["t012", "c_base"], ["duration"], None)],
        {"c_dur": np.float32(0.02), "c_id": np.float32(0.0005),
         "c_s": np.float32(0.1), "c_base": np.float32(0.5),
         "ax1": np.asarray([1], I64)},
        [("text_ids", I64, ("B", "L")), ("style_dp", F32, ("B", 2, 4)),
         ("text_mask", F32, ("B", 1, "L"))],
        [("duration", F32, ("B",))],
    )
    (d / "duration_predictor.onnx").write_bytes(dp)

    # -- text_encoder.onnx --------------------------------------------------
    te = _model(
        [("Gather", ["emb", "text_ids"], ["g"], {"axis": 0}),
         ("Transpose", ["g"], ["gt"], {"perm": [0, 2, 1]}),
         ("ReduceMean", ["style_ttl"], ["sm"], {"axes": [1, 2], "keepdims": 1}),
         ("Add", ["gt", "sm"], ["gs"], None),
         # mask LAST so padded positions are exactly zero (mask-correct)
         ("Mul", ["gs", "text_mask"], ["text_emb"], None)],
        {"emb": w["emb"]},
        [("text_ids", I64, ("B", "L")), ("style_ttl", F32, ("B", 2, 4)),
         ("text_mask", F32, ("B", 1, "L"))],
        [("text_emb", F32, ("B", E, "L"))],
    )
    (d / "text_encoder.onnx").write_bytes(te)

    # -- vector_estimator.onnx (Euler update INSIDE the graph, §2.2) --------
    ve = _model(
        [("Div", ["one", "total_step"], ["dt"], None),
         ("Unsqueeze", ["dt", "ax12"], ["dt3"], None),
         ("Div", ["current_step", "total_step"], ["frac"], None),
         ("Sub", ["one", "frac"], ["decay"], None),
         ("Unsqueeze", ["decay", "ax12"], ["decay3"], None),
         ("Conv", ["noisy_latent", "w_conv"], ["cv"],
          {"pads": [1, 1], "kernel_shape": [3]}),
         # masked mean over L: text_emb is already mask-zeroed by the
         # encoder, so sum / count(mask) is padding-invariant
         ("ReduceSum", ["text_emb"], ["poolsum"], {"axes": [2], "keepdims": 1}),
         ("ReduceSum", ["text_mask"], ["mcount"], {"axes": [2], "keepdims": 1}),
         ("Div", ["poolsum", "mcount"], ["pool"], None),
         ("Transpose", ["pool"], ["poolt"], {"perm": [0, 2, 1]}),
         ("MatMul", ["poolt", "w_proj"], ["proj"], None),
         ("Transpose", ["proj"], ["projt"], {"perm": [0, 2, 1]}),
         ("Add", ["cv", "projt"], ["v0"], None),
         ("Mul", ["v0", "latent_mask"], ["v1"], None),
         ("Mul", ["v1", "dt3"], ["v2"], None),
         ("Mul", ["v2", "decay3"], ["v3"], None),
         ("Add", ["noisy_latent", "v3"], ["denoised_latent"], None)],
        {"one": np.float32(1.0), "ax12": np.asarray([1, 2], I64),
         "w_conv": w["w_conv"], "w_proj": w["w_proj"]},
        [("noisy_latent", F32, ("B", C, "T")), ("text_emb", F32, ("B", E, "L")),
         ("style_ttl", F32, ("B", 2, 4)), ("text_mask", F32, ("B", 1, "L")),
         ("latent_mask", F32, ("B", 1, "T")), ("current_step", F32, ("B",)),
         ("total_step", F32, ("B",))],
        [("denoised_latent", F32, ("B", C, "T"))],
    )
    (d / "vector_estimator.onnx").write_bytes(ve)

    # -- vocoder.onnx --------------------------------------------------------
    voc = _model(
        [("ConvTranspose", ["latent", "w_voc"], ["up"],
          {"strides": [BASE_CHUNK * CCF], "kernel_shape": [BASE_CHUNK * CCF]}),
         ("Squeeze", ["up", "ax1"], ["sq"], None),
         ("Tanh", ["sq"], ["wav_tts"], None)],
        {"w_voc": w["w_voc"], "ax1": np.asarray([1], I64)},
        [("latent", F32, ("B", C, "T"))],
        [("wav_tts", F32, ("B", "W"))],
    )
    (d / "vocoder.onnx").write_bytes(voc)

    with open(d / "tts.json", "w") as f:
        json.dump({"ae": {"sample_rate": SR, "base_chunk_size": BASE_CHUNK},
                   "ttl": {"chunk_compress_factor": CCF, "latent_dim": LDIM}},
                  f)
    indexer = [i % (V - 1) for i in range(0x800)]
    with open(d / "unicode_indexer.json", "w") as f:
        json.dump(indexer, f)
    return str(d)


class NumpyReplica:
    """Independent evaluation of the same four graphs (numpy + torch conv)."""

    def __init__(self, onnx_dir):
        self.w = np.load(os.path.join(onnx_dir, "weights.npy"),
                         allow_pickle=True).item()

    def dp(self, ids, style_dp, mask):
        msum = mask.sum((1, 2))
        idm = (ids * mask[:, 0, :]).sum(1) / msum
        return (msum * 0.02 + idm * 0.0005
                + style_dp.mean((1, 2)) * 0.1 + 0.5).astype(F32)

    def text_enc(self, ids, style_ttl, mask):
        g = self.w["emb"][ids].transpose(0, 2, 1)
        return (g + style_ttl.mean((1, 2), keepdims=True)) * mask

    def estimator(self, xt, emb, tmask, lmask, cs, ts):
        import torch
        import torch.nn.functional as tF

        cv = tF.conv1d(torch.from_numpy(xt), torch.from_numpy(self.w["w_conv"]),
                       padding=1).numpy()
        pool = emb.sum(2, keepdims=True) / tmask.sum(2, keepdims=True)
        proj = (pool.transpose(0, 2, 1) @ self.w["w_proj"]).transpose(0, 2, 1)
        dt = (1.0 / ts)[:, None, None]
        decay = (1.0 - cs / ts)[:, None, None]
        return xt + (cv + proj) * lmask * dt * decay

    def vocoder(self, xt):
        import torch
        import torch.nn.functional as tF

        up = tF.conv_transpose1d(torch.from_numpy(xt),
                                 torch.from_numpy(self.w["w_voc"]),
                                 stride=BASE_CHUNK * CCF).numpy()
        return np.tanh(up[:, 0, :])


def test_pipeline_matches_numpy_replica(onnx_dir):
    pipe = load_onnx_pipeline(onnx_dir)
    replica = NumpyReplica(onnx_dir)
    rng = np.random.default_rng(3)

    texts = ["Hello there, world.", "A second, different sentence!"]
    langs = ["en", "en"]

    class Style:
        ttl = rng.standard_normal((2, 2, 4)).astype(F32)
        dp = rng.standard_normal((2, 2, 4)).astype(F32)

    ids, mask = pipe.processor(texts, langs)
    dur = replica.dp(ids.astype(F32), Style.dp, mask) / 1.05
    chunk = BASE_CHUNK * CCF
    t_lat = int(np.ceil(dur.max() * SR / chunk))
    noise = rng.standard_normal((2, C, t_lat)).astype(F32)

    wav, dur_got = pipe._infer(texts, langs, Style, total_step=3,
                               speed=1.05, noise=noise)
    np.testing.assert_allclose(dur_got, dur, rtol=1e-5, atol=1e-6)

    # replica path
    wl = (dur * SR).astype(np.int64)
    ll = (wl + chunk - 1) // chunk
    lmask = (np.arange(t_lat)[None, :] < ll[:, None]).astype(F32)[:, None, :]
    emb = replica.text_enc(ids, Style.ttl, mask)
    xt = noise * lmask
    ts = np.full((2,), 3.0, F32)
    for s in range(3):
        xt = replica.estimator(xt, emb, mask, lmask,
                               np.full((2,), float(s), F32), ts)
    ref_wav = replica.vocoder(xt)
    assert wav.shape == ref_wav.shape == (2, t_lat * chunk)
    np.testing.assert_allclose(wav, ref_wav, rtol=1e-4, atol=1e-5)


def test_pipeline_seeded_determinism(onnx_dir):
    rng = np.random.default_rng(5)

    class Style:
        ttl = rng.standard_normal((1, 2, 4)).astype(F32)
        dp = rng.standard_normal((1, 2, 4)).astype(F32)

    w1, d1 = load_onnx_pipeline(onnx_dir, seed=11)._infer(
        ["Same text."], ["en"], Style, 2)
    w2, d2 = load_onnx_pipeline(onnx_dir, seed=11)._infer(
        ["Same text."], ["en"], Style, 2)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(d1, d2)


def test_bucketed_pipeline_padding_invariant(onnx_dir):
    """Bucketed (L, T) padding must not change trimmed waveforms — the
    graphs are mask-driven (SURVEY.md §2.2), so extra masked frames are
    inert. Same injected noise through both pipelines."""
    from supertonic_tpu.assets.onnx_pipeline import load_onnx_pipeline as L

    exact = L(onnx_dir)
    bucketed = L(onnx_dir, bucketed=True)
    assert bucketed.text_buckets and bucketed.latent_buckets
    rng = np.random.default_rng(11)

    class Style:
        ttl = rng.standard_normal((1, 2, 4)).astype(F32)
        dp = rng.standard_normal((1, 2, 4)).astype(F32)

    text = ["A padding invariance check sentence."]
    ids, mask = exact.processor(text, ["en"])
    dur = None
    # compute exact latent_len to build shared noise
    (d0,) = exact.dp.run(None, {"text_ids": ids.astype(np.int64),
                                "style_dp": Style.dp,
                                "text_mask": mask.astype(F32)})
    dur = np.asarray(d0, F32) / 1.05
    chunk = BASE_CHUNK * CCF
    t_lat = int(np.ceil(dur.max() * SR / chunk))
    noise = rng.standard_normal((1, C, t_lat)).astype(F32)

    w1, d1 = exact._infer(text, ["en"], Style, total_step=2, noise=noise)
    w2, d2 = bucketed._infer(text, ["en"], Style, total_step=2, noise=noise)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    n = int(SR * float(d1[0]))
    assert w2.shape[1] >= w1.shape[1]  # bucket-padded output is longer
    np.testing.assert_allclose(w1[:, :n], w2[:, :n], rtol=1e-4, atol=1e-5)


def test_bucketed_pipeline_bounds_compiles(onnx_dir):
    """Different text lengths landing in one bucket reuse one compiled
    program per graph (the whole point of the ladders)."""
    from supertonic_tpu.assets.onnx_pipeline import load_onnx_pipeline as L

    pipe = L(onnx_dir, bucketed=True)
    rng = np.random.default_rng(3)

    class Style:
        ttl = rng.standard_normal((1, 2, 4)).astype(F32)
        dp = rng.standard_normal((1, 2, 4)).astype(F32)

    # all three normalize to lengths in (32, 64] -> one text bucket
    for text in ("A sentence of medium length here.",
                 "Another sentence, a bit longer than that.",
                 "Third different length text for the cache."):
        pipe._infer([text], ["en"], Style, total_step=2)
    # all three land in the first text bucket -> exactly one dp/text_enc
    # compile; latent lengths may span at most a couple of buckets
    assert pipe.dp._jfn._cache_size() == 1
    assert pipe.text_enc._jfn._cache_size() == 1
    assert pipe.vector_est._jfn._cache_size() <= 2
    assert pipe.vocoder._jfn._cache_size() <= 2


def test_compat_loader_auto_selects_onnx_backend(onnx_dir):
    """compat.load_text_to_speech(dir) with real graphs but no converted
    params must return the graph-executor pipeline (reference loader
    semantics, py/helper.py:322-336)."""
    import numpy as np

    from supertonic_tpu.assets.onnx_pipeline import OnnxPipeline
    from supertonic_tpu.compat import load_text_to_speech

    tts = load_text_to_speech(onnx_dir)
    assert isinstance(tts, OnnxPipeline)
    assert tts.sample_rate == SR

    rng = np.random.default_rng(1)

    class Style:
        ttl = rng.standard_normal((1, 2, 4)).astype(F32)
        dp = rng.standard_normal((1, 2, 4)).astype(F32)

    wav, dur = tts("A compat call.", "en", Style, total_step=2)
    assert wav.shape[0] == 1 and float(dur[0]) > 0

    native = load_text_to_speech(None, backend="native")
    assert not isinstance(native, OnnxPipeline)


def test_pipeline_longform_call(onnx_dir):
    pipe = load_onnx_pipeline(onnx_dir, seed=1)
    rng = np.random.default_rng(9)

    class Style:
        ttl = rng.standard_normal((1, 2, 4)).astype(F32)
        dp = rng.standard_normal((1, 2, 4)).astype(F32)

    text = ("First sentence of a long paragraph. " * 6
            + "\n\n" + "Second paragraph here. " * 5)
    wav, dur = pipe(text, "en", Style, total_step=2, silence_duration=0.25)
    assert wav.ndim == 2 and wav.shape[0] == 1
    assert float(dur[0]) > 0
    # at least 2 chunks -> at least one 0.25 s silence joint baked in
    from supertonic_tpu.frontend import chunk_text

    n_chunks = len(chunk_text(text, max_len=300))
    assert n_chunks >= 2
    # padded chunks concatenated like the reference (py/helper.py:233-244):
    # total sample count >= silence samples + per-chunk latent grids
    assert wav.shape[1] >= int(0.25 * SR) * (n_chunks - 1)


def test_bucketed_longform_call_matches_exact(onnx_dir):
    """Bucketed __call__ must CONCATENATE identically to the exact pipeline:
    pad-region audio leaking between chunks was a real bug (code review r2)."""
    from supertonic_tpu.assets.onnx_pipeline import load_onnx_pipeline as L

    rng = np.random.default_rng(5)

    class Style:
        ttl = rng.standard_normal((1, 2, 4)).astype(F32)
        dp = rng.standard_normal((1, 2, 4)).astype(F32)

    text = ("A first sentence for the long form test. " * 5
            + "Then a second block of text follows here. " * 4)
    w1, d1 = L(onnx_dir, seed=3)(text, "en", Style, total_step=2)
    w2, d2 = L(onnx_dir, seed=3, bucketed=True)(text, "en", Style,
                                                total_step=2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    assert w1.shape == w2.shape  # identical concat geometry
    np.testing.assert_allclose(w1, w2, rtol=1e-4, atol=1e-5)
