"""Fused ONNX stage backend (assets/onnx_backend) under the full engine.

Reuses the synthetic four-graph asset fixture from test_onnx_pipeline: the
same §2.2-contract graphs run through SynthesisEngine(backend=...) — the
fused single-program path — and must agree with the independent numpy/torch
replica, proving the real graphs inherit the engine's bucketing / learned
rate / pipelined dispatch with unchanged semantics.
"""

import json
import os

import numpy as np
import pytest

from supertonic_tpu import TTS, SynthesisEngine
from supertonic_tpu.assets.onnx_backend import load_onnx_backend
from supertonic_tpu.config import load_tts_json
from supertonic_tpu.engine import VoiceStyle
from supertonic_tpu.frontend import UnicodeProcessor

from test_onnx_pipeline import (  # noqa: F401  (module-scoped fixture)
    BASE_CHUNK, CCF, NumpyReplica, SR, onnx_dir,
)

F32 = np.float32
CHUNK = BASE_CHUNK * CCF


def _engine(onnx_dir, *, seed=0, mp="float32"):
    cfg = load_tts_json(os.path.join(onnx_dir, "tts.json"))
    with open(os.path.join(onnx_dir, "unicode_indexer.json")) as f:
        processor = UnicodeProcessor(np.asarray(json.load(f), np.int64))
    backend = load_onnx_backend(onnx_dir, cfg, matmul_precision=mp)
    return SynthesisEngine(backend.params, cfg, processor,
                           precision="f32", seed=seed, backend=backend)


def _style(rng, b=1):
    return VoiceStyle(rng.standard_normal((b, 2, 4)).astype(F32),
                      rng.standard_normal((b, 2, 4)).astype(F32))


def test_backend_engine_matches_replica_injected_noise(onnx_dir):  # noqa: F811
    """Engine injected-noise path (text_fn + acoustic_fn over the graphs)
    against the independent replica — same noise, same waveform."""
    eng = _engine(onnx_dir)
    replica = NumpyReplica(onnx_dir)
    rng = np.random.default_rng(3)

    texts = ["Hello there, world.", "A second, different sentence!"]
    langs = ["en", "en"]
    style = _style(rng, b=2)

    ids, mask = eng.processor(texts, langs)
    dur = replica.dp(ids.astype(F32), style.dp, mask) / 1.05
    t_lat = int(np.ceil(dur.max() * SR / CHUNK))
    noise_cf = rng.standard_normal(
        (2, CCF * 3, t_lat)).astype(F32)  # [B, C, T] replica layout

    wav, dur_got = eng.infer_batch(
        texts, langs, style, total_step=3, speed=1.05,
        noise=noise_cf.transpose(0, 2, 1),  # engine layout [B, T, C]
    )
    np.testing.assert_allclose(dur_got, dur, rtol=1e-5, atol=1e-6)

    wl = (dur * SR).astype(np.int64)
    ll = (wl + CHUNK - 1) // CHUNK
    lmask = (np.arange(t_lat)[None, :] < ll[:, None]).astype(F32)[:, None, :]
    emb = replica.text_enc(ids, style.ttl, mask)
    xt = noise_cf * lmask
    ts = np.full((2,), 3.0, F32)
    for s in range(3):
        xt = replica.estimator(xt, emb, mask, lmask,
                               np.full((2,), float(s), F32), ts)
    ref_wav = replica.vocoder(xt)
    assert wav.shape[0] == 2 and wav.shape[1] >= ref_wav.shape[1]
    np.testing.assert_allclose(wav[:, : ref_wav.shape[1]], ref_wav,
                               rtol=1e-4, atol=1e-5)


def test_backend_fused_path_duration_and_determinism(onnx_dir):  # noqa: F811
    """The fully-fused program (on-device noise): duration must equal the
    replica's dp output (duration is noise-independent), and identical seeds
    must give identical audio."""
    replica = NumpyReplica(onnx_dir)
    rng = np.random.default_rng(5)
    style = _style(rng)
    text, lang = ["One deterministic sentence."], ["en"]

    # construct BOTH engines before running either: the learned-rate disk
    # cache written by the first run must not steer the second to a
    # different latent bucket (noise shape => different draws)
    eng1 = _engine(onnx_dir, seed=11)
    eng2 = _engine(onnx_dir, seed=11)
    w1, d1 = eng1.infer_batch(text, lang, style, total_step=2)
    w2, d2 = eng2.infer_batch(text, lang, style, total_step=2)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(d1, d2)

    ids, mask = eng1.processor(text, lang)
    dur_ref = replica.dp(ids.astype(F32), style.dp, mask) / 1.05
    np.testing.assert_allclose(d1, dur_ref, rtol=1e-4, atol=1e-6)
    assert w1.dtype == np.float32  # egress int16 decoded at the host
    assert w1.shape[1] % CHUNK == 0
    assert np.isfinite(w1).all()


def test_backend_progress_callbacks(onnx_dir):  # noqa: F811
    """infer_with_progress through the backend's per-step programs fires a
    callback per COMPLETED denoise step (reference web/helper.js:215-218)."""
    eng = _engine(onnx_dir)
    rng = np.random.default_rng(7)
    seen = []
    wav, dur = eng.infer_with_progress(
        "Progress check.", "en", _style(rng), total_step=3,
        progress_callback=lambda s, t: seen.append((s, t)),
    )
    assert seen == [(1, 3), (2, 3), (3, 3)]
    assert wav.shape[0] == 1 and np.isfinite(wav).all()


def test_tts_selects_fused_backend(onnx_dir, monkeypatch):  # noqa: F811
    """TTS() over a fetched-but-unconverted bundle serves through the fused
    engine backend by default; TTS_ONNX_FUSED=0 selects the
    reference-orchestration adapter."""
    monkeypatch.delenv("TTS_ONNX_FUSED", raising=False)
    tts = TTS(onnx_dir)
    assert isinstance(tts.engine, SynthesisEngine)
    assert tts.engine.backend is not None
    rng = np.random.default_rng(9)
    wav, dur = tts.synthesize("A fused backend sentence.", _style(rng))
    assert wav.shape[0] == 1 and float(dur[0]) > 0
    assert np.isfinite(wav).all()

    monkeypatch.setenv("TTS_ONNX_FUSED", "0")
    from supertonic_tpu.engine.onnx_adapter import OnnxEngineAdapter

    tts2 = TTS(onnx_dir)
    assert isinstance(tts2.engine, OnnxEngineAdapter)


def test_backend_mesh_matches_single_device(onnx_dir):  # noqa: F811
    """Real-graph serving scales data-parallel: the fused executor programs
    under an 8-device mesh (weights replicated — unknown param names get
    P() from param_pspecs; batches sharded over 'data') must match
    single-device output exactly."""
    from supertonic_tpu.parallel import make_mesh

    cfg = load_tts_json(os.path.join(onnx_dir, "tts.json"))
    with open(os.path.join(onnx_dir, "unicode_indexer.json")) as f:
        processor = UnicodeProcessor(np.asarray(json.load(f), np.int64))
    backend = load_onnx_backend(onnx_dir, cfg, matmul_precision="float32")

    single = SynthesisEngine(backend.params, cfg, processor, precision="f32",
                             seed=3, egress_format="f32", backend=backend)
    sharded = SynthesisEngine(backend.params, cfg, processor, precision="f32",
                              seed=3, egress_format="f32", backend=backend,
                              mesh=make_mesh(8))
    # pin both engines to the same latent-bucket prior (the learned-rate
    # disk cache would otherwise steer them to different noise grids)
    for e in (single, sharded):
        e._pin_rate(1.0 / 11.0)

    texts = [f"Mesh utterance number {i}." for i in range(8)]
    rng = np.random.default_rng(13)
    style = _style(rng, b=8)
    w1, d1 = single.batch(texts, ["en"] * 8, style, total_step=2)
    w2, d2 = sharded.batch(texts, ["en"] * 8, style, total_step=2)
    np.testing.assert_allclose(d1, d2, atol=1e-6)
    np.testing.assert_allclose(w1, w2, atol=3e-5)


def test_backend_contract_name_mismatch_raises(onnx_dir, tmp_path):  # noqa: F811
    """A graph whose inputs deviate from the §2.2 name contract is rejected
    loudly at load (not with a cryptic trace error later)."""
    import shutil

    from supertonic_tpu.assets import onnx_reader as R

    d = tmp_path / "bad"
    shutil.copytree(onnx_dir, d)
    node = R.encode_node("Identity", ["x"], ["duration"], name="n0")
    vi_in = R.encode_value_info("x", np.float32, ("B",))
    vi_out = R.encode_value_info("duration", np.float32, ("B",))
    (d / "duration_predictor.onnx").write_bytes(
        R.encode_model("g", [node], [], [vi_in], [vi_out]))
    cfg = load_tts_json(str(d / "tts.json"))
    with pytest.raises(ValueError, match="contract"):
        load_onnx_backend(str(d), cfg)

    # ...and TTS() must NOT swallow it into a random-init fallback (serving
    # random weights for structurally-wrong graphs hides a real bug)
    with pytest.raises(ValueError, match="contract"):
        TTS(str(d))


def test_backend_bucket_discipline_bounds_compiles(onnx_dir):  # noqa: F811
    """The fused executor program must honor the same (B, L, T) bucket
    ladders as the native engine: same-bucket requests reuse one compiled
    program (tests/test_recompile.py twin for the graph backend)."""
    eng = _engine(onnx_dir)
    rng = np.random.default_rng(17)
    style = _style(rng)
    # all three land in the same (L=64, B=1, T, steps) bucket cell
    eng.infer_batch(["First warm sentence right here."], ["en"], style,
                    total_step=2)
    n0 = eng._fused_fn._cache_size()
    # same text bucket, same batch bucket, same steps -> zero new compiles
    eng.infer_batch(["Second warm sentence goes here."], ["en"], style,
                    total_step=2)
    eng.infer_batch(["Third warm sentence lives here!"], ["en"], style,
                    total_step=2)
    assert eng._fused_fn._cache_size() == n0
    # different step count -> exactly the new static config compiles
    eng.infer_batch(["Different steps now."], ["en"], style, total_step=3)
    assert eng._fused_fn._cache_size() > n0


def test_untraceable_fused_backend_falls_back_to_adapter(
        onnx_dir, tmp_path, monkeypatch):  # noqa: F811
    """A graph set that can't compose into the fused programs (estimator
    output grows T by one — breaks the fori_loop shape invariant) must be
    caught by the startup eval_shape validation, and TTS() degrades to the
    per-call adapter instead of 500ing the first request."""
    import shutil

    from supertonic_tpu.assets import onnx_reader as R
    from supertonic_tpu.engine.onnx_adapter import OnnxEngineAdapter

    d = tmp_path / "loopbreaker"
    shutil.copytree(onnx_dir, d)
    w = np.load(os.path.join(onnx_dir, "weights.npy"),
                allow_pickle=True).item()
    C = CCF * 3
    nodes = [R.encode_node("Conv", ["noisy_latent", "w_conv"], ["cv"],
                           name="n0",
                           attrs={"pads": [1, 1], "kernel_shape": [3]}),
             R.encode_node("Pad", ["cv", "pads"], ["denoised_latent"],
                           name="n1")]
    inits = [R.encode_tensor("w_conv", w["w_conv"]),
             R.encode_tensor("pads", np.asarray([0, 0, 0, 0, 0, 1],
                                                np.int64))]
    vis_in = [R.encode_value_info("noisy_latent", np.float32, ("B", C, "T")),
              R.encode_value_info("text_emb", np.float32, ("B", 5, "L")),
              R.encode_value_info("style_ttl", np.float32, ("B", 2, 4)),
              R.encode_value_info("text_mask", np.float32, ("B", 1, "L")),
              R.encode_value_info("latent_mask", np.float32, ("B", 1, "T")),
              R.encode_value_info("current_step", np.float32, ("B",)),
              R.encode_value_info("total_step", np.float32, ("B",))]
    vis_out = [R.encode_value_info("denoised_latent", np.float32,
                                   ("B", C, "T1"))]
    (d / "vector_estimator.onnx").write_bytes(
        R.encode_model("g", nodes, inits, vis_in, vis_out))

    monkeypatch.delenv("TTS_ONNX_FUSED", raising=False)
    tts = TTS(str(d))
    assert isinstance(tts.engine, OnnxEngineAdapter)


def test_bf16_storage_parity_floor(onnx_dir):  # noqa: F811
    """Gate for the bf16-activation-storage DEFAULT on graph serving
    (VERDICT r3 item 3): with identical seed/noise, the bf16-storage
    executor's waveform must stay within 1% RMS of the f32 executor's.
    Also pins the default wiring: bf16 storage ON for the bf16 fast path,
    OFF under strict f32 (the parity-gate arm)."""
    cfg = load_tts_json(os.path.join(onnx_dir, "tts.json"))
    with open(os.path.join(onnx_dir, "unicode_indexer.json")) as f:
        processor = UnicodeProcessor(np.asarray(json.load(f), np.int64))

    # default wiring (no explicit bf16_storage):
    b_f32 = load_onnx_backend(onnx_dir, cfg, matmul_precision="float32")
    b_fast = load_onnx_backend(onnx_dir, cfg, matmul_precision="default")
    assert not b_f32.execs["vector_estimator"]._bf16_storage
    assert b_fast.execs["vector_estimator"]._bf16_storage

    text, lang = ["Parity floor sentence for the bf16 gate."], ["en"]
    rng = np.random.default_rng(7)
    style = _style(rng)
    e_f32 = SynthesisEngine(b_f32.params, cfg, processor, precision="f32",
                            seed=3, backend=b_f32)
    e_bf16 = SynthesisEngine(b_fast.params, cfg, processor, precision="f32",
                             seed=3, backend=b_fast)
    w32, d32 = e_f32.infer_batch(text, lang, style, total_step=2)
    w16, d16 = e_bf16.infer_batch(text, lang, style, total_step=2)
    np.testing.assert_allclose(d32, d16, rtol=1e-2)
    n = min(w32.shape[1], w16.shape[1])
    sig = float(np.sqrt(np.mean(w32[:, :n] ** 2)))
    diff = float(np.sqrt(np.mean((w32[:, :n] - w16[:, :n]) ** 2)))
    assert sig > 0
    assert diff <= 0.01 * sig, (
        f"bf16 storage wav RMS diff {diff/sig:.2%} exceeds the 1% floor")
