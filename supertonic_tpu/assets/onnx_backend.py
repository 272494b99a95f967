"""Fused SynthesisEngine backend over the generic ONNX-graph executor.

``OnnxEngineAdapter`` (engine/onnx_adapter.py) serves the four REAL
reference graphs with reference-identical orchestration: one dispatch per
graph call, 3 + total_step host round-trips per batch — exactly the cost
profile the reference pays per ORT call (py/helper.py:177-215). This module
is the TPU-native fast path for the same graphs: the four executors'
*traced* bodies are composed into the engine's stage programs

  text_fn      duration_predictor + text_encoder        (one program)
  acoustic_fn  lax.fori_loop(vector_estimator) + vocoder (one program)
  fused_fn     all four + on-device noise + egress quantize (ONE program)

so a ``SynthesisEngine(..., backend=OnnxStageBackend(...))`` runs real
graphs with ZERO mid-pipeline host syncs and inherits everything the native
engine has: (B, L, T) bucket ladders, the learned speaking-rate latent
estimate, the device-resident style cache, sliced egress, begin/end
dispatch pipelining, the continuous batcher, and /metrics. Weight mapping
is still not required — real-weight serving at fused-path dispatch cost is
a data drop (SURVEY.md §2.2 contract; VERDICT r1 item 1).

Layouts: the engine speaks channel-last ([B, T, C] latents, [B, L] masks);
the graphs speak the reference's channel-first contract ([B, C, T],
[B, 1, L]) — conversion happens inside the traced programs where it is a
free relayout for XLA, not a host copy.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import TTSConfig
from .onnx_exec import OnnxExecutor

__all__ = ["ContractMismatch", "OnnxStageBackend", "load_onnx_backend"]


class ContractMismatch(ValueError):
    """Graph inputs deviate from the §2.2 reference contract. Deliberately
    NOT an asset-corruption error: callers that degrade gracefully on
    unreadable fetches must still fail LOUDLY on this (serving random-init
    weights instead of a structurally different model hides a real bug)."""

# §2.2 I/O contract (reference cpp/helper.cpp:512-664, go/helper.go:873-892)
_CONTRACT = {
    "duration_predictor": ("text_ids", "style_dp", "text_mask"),
    "text_encoder": ("text_ids", "style_ttl", "text_mask"),
    "vector_estimator": ("noisy_latent", "text_emb", "style_ttl", "text_mask",
                         "latent_mask", "current_step", "total_step"),
    "vocoder": ("latent",),
}


def _caller(name: str, exe: OnnxExecutor) -> Callable:
    """Name-keyed invocation of an executor's traced body (feed order is
    whatever the graph declares; the contract only fixes the name set)."""
    declared = set(exe.input_names)
    expected = set(_CONTRACT[name])
    if declared != expected:
        raise ContractMismatch(
            f"{name}.onnx inputs {sorted(declared)} do not match the "
            f"reference contract {sorted(expected)} (SURVEY.md §2.2)"
        )
    if "time_mask" in declared:  # unreachable under _CONTRACT today, but the
        # failure mode would be obscure (ADVICE r4): call()'s reserved
        # ``time_mask`` kwarg would swallow the graph input and the by_name
        # lookup would KeyError far from the cause
        raise ContractMismatch(
            f"{name}.onnx declares an input literally named 'time_mask', "
            "which collides with the executor's reserved padding-mask kwarg"
        )

    def call(weights: dict, time_mask=None, **by_name):
        return exe._run_traced(
            weights, tuple(by_name[n] for n in exe.input_names), time_mask
        )

    return call


class OnnxStageBackend:
    """Engine stage programs composed from four ONNX-graph executors.

    ``params`` is the pytree the engine passes back into every stage call
    (weights stay jit *arguments* — never closed over, per CLAUDE.md).
    """

    def __init__(self, execs: dict[str, OnnxExecutor], cfg: TTSConfig):
        self.cfg = cfg
        self.execs = execs
        self.params = {name: dict(exe._weights) for name, exe in execs.items()}
        self._call = {name: _caller(name, exe) for name, exe in execs.items()}
        self.text_fn = jax.jit(self._text_stage)
        self.acoustic_fn = jax.jit(self._acoustic_stage, static_argnums=(6,))
        self.fused_fn = jax.jit(self._fused, static_argnums=(7, 8, 9))

    # -- traced stage bodies (engine-facing signatures match synthesis.py) --

    def _text_stage(self, params, ids, mask, sdp, sttl, speed):
        mask3 = mask[:, None, :].astype(jnp.float32)
        (dur,) = self._call["duration_predictor"](
            params["duration_predictor"],
            text_ids=ids, style_dp=sdp, text_mask=mask3,
        )
        dur = dur.astype(jnp.float32) / speed
        (emb,) = self._call["text_encoder"](
            params["text_encoder"],
            text_ids=ids, style_ttl=sttl, text_mask=mask3,
        )
        return dur, emb

    def _acoustic_stage(self, params, emb, sttl, tmask, lmask, noise,
                        total_step: int):
        b = lmask.shape[0]
        tmask3 = tmask[:, None, :].astype(jnp.float32)
        lmask3 = lmask[:, None, :].astype(jnp.float32)
        # engine noise is channel-last [B, T, C]; graphs take [B, C, T]
        x0 = jnp.transpose(
            noise.astype(jnp.float32) * lmask[:, :, None], (0, 2, 1)
        )
        tot = jnp.full((b,), float(total_step), jnp.float32)

        def body(step, x):
            cur = jnp.full((b,), 1.0, jnp.float32) * step
            (x2,) = self._call["vector_estimator"](
                params["vector_estimator"],
                noisy_latent=x, text_emb=emb, style_ttl=sttl,
                text_mask=tmask3, latent_mask=lmask3,
                current_step=cur, total_step=tot,
            )
            return x2.astype(x.dtype)

        xt = jax.lax.fori_loop(0, total_step, body, x0)
        # BATCH-MAX frame mask: the reference vocoder graph is mask-free
        # and runs at batch-max length (per-row halo = reference
        # semantics), but frames beyond the longest utterance are BUCKET
        # padding this engine adds — pre-mask the latent and let the
        # executor re-zero them after every conv (_apply_time_mask), making
        # bucketed execution bit-identical to exact-length execution.
        fmask = jnp.max(lmask.astype(jnp.float32), axis=0)  # [T]
        xt = xt * fmask[None, None, :]
        (wav,) = self._call["vocoder"](params["vocoder"], latent=xt,
                                       time_mask=fmask)
        return self._fit_wav(wav, lmask.shape[1])

    def _fit_wav(self, wav, t_frames: int):
        # contract: wav [B, T*chunk] (§2.2 padded output) — normalize width
        # defensively so the engine's egress slicing math always holds
        want = t_frames * self.cfg.chunk_size
        if wav.shape[1] < want:
            wav = jnp.pad(wav, ((0, 0), (0, want - wav.shape[1])))
        elif wav.shape[1] > want:
            wav = wav[:, :want]
        return wav.astype(jnp.float32)

    def _fused(self, params, ids, mask, sdp, sttl, key, speed,
               total_step: int, t_pad: int, egress: str):
        from ..engine import synthesis as S

        dur, emb = self._text_stage(params, ids, mask, sdp, sttl, speed)
        chunk = self.cfg.chunk_size
        latent_len = jnp.minimum(
            jnp.ceil(dur * self.cfg.sample_rate / chunk), float(t_pad)
        )
        frame_idx = jnp.arange(t_pad, dtype=jnp.float32)[None, :]
        lmask = (frame_idx < latent_len[:, None]).astype(jnp.float32)
        b = ids.shape[0]
        noise = jax.random.normal(
            key, (b, t_pad, self.cfg.latent_channels), jnp.float32)
        wav = self._acoustic_stage(params, emb, sttl, mask, lmask, noise,
                                   total_step)
        if egress == "int16":
            wav = jnp.clip(wav * 32767.0, -32768.0, 32767.0).astype(jnp.int16)
        elif egress == "mulaw":
            wav = S._mulaw_encode(wav)
        return wav, dur

    def validate(self, *, total_step: int = 2, t_pad: int = 32,
                 l_pad: int = 16) -> None:
        """Abstractly trace the fused program on tiny shapes
        (jax.eval_shape: no XLA compile, milliseconds). Raises the
        UnsupportedOp/ValueError a real graph would otherwise throw on the
        FIRST live request — callers can fall back to the per-call adapter
        at startup instead of serving 500s."""
        cfg = self.cfg
        S = jax.ShapeDtypeStruct
        ids = S((1, l_pad), jnp.int32)
        mask = S((1, l_pad), jnp.float32)
        sdp = S((1, cfg.dp.style.n_style, cfg.dp.style.style_value_dim),
                jnp.float32)
        sttl = S((1, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim),
                 jnp.float32)
        key = jax.random.key(0)

        def run(params, i, m, a, b):
            return self.fused_fn(params, i, m, a, b, key,
                                 jnp.float32(1.05), total_step, t_pad,
                                 "int16")

        jax.eval_shape(run, self.params, ids, mask, sdp, sttl)

    # -- step-at-a-time programs for engine.infer_with_progress ------------

    def progress_fns(self):
        """(cross_fn|None, step_fn, vocoder_fn): no cross-attention cache is
        extractable from an opaque graph, so cross_fn is None and each step
        re-runs the full estimator graph (still one dispatch per step, like
        the reference's per-step ORT call)."""

        def _step(params, x, emb, sttl, tmask, lmask, cur, tot, cache=None):
            del cache
            tmask3 = tmask[:, None, :].astype(jnp.float32)
            lmask3 = lmask[:, None, :].astype(jnp.float32)
            (x2,) = self._call["vector_estimator"](
                params["vector_estimator"],
                noisy_latent=jnp.transpose(x, (0, 2, 1)), text_emb=emb,
                style_ttl=sttl, text_mask=tmask3, latent_mask=lmask3,
                current_step=cur, total_step=tot,
            )
            return jnp.transpose(x2, (0, 2, 1)).astype(x.dtype)

        def _voc(params, x, fm):
            # fm [T]: batch-max frame mask (see _acoustic_stage) — pre-mask
            # the latent and re-zero after every conv inside the graph
            xm = jnp.transpose(x, (0, 2, 1)) * fm[None, None, :]
            (wav,) = self._call["vocoder"](
                params["vocoder"], latent=xm, time_mask=fm)
            return self._fit_wav(wav, x.shape[1])

        return None, jax.jit(_step), jax.jit(_voc)


def load_onnx_backend(onnx_dir: str, cfg: TTSConfig, *,
                      matmul_precision: str = "default",
                      bf16_storage: bool | None = None) -> OnnxStageBackend:
    """Build the fused stage backend from a directory holding the four
    reference graphs (reference py/helper.py:289-306 layout).

    ``matmul_precision``: "float32" for ORT-parity-strict matmuls (SURVEY.md
    §7.3 hard part 2), "default" for the bf16-pass TPU fast path.
    ``bf16_storage``: store MatMul/Conv activations bfloat16 inside the
    traced graphs — halves the flow loop's HBM traffic, the same lever as
    the native engine's bf16 fast path (+35% executor throughput measured,
    docs/PERFORMANCE.md). Default: ON whenever the serving precision is the
    bf16 fast path, OFF in strict-f32 mode (the ORT-parity gate passes
    False explicitly); TTS_ONNX_BF16=0/1 overrides either way. The default
    is gated by the parity-floor test (wav RMS diff vs the f32 executor
    <= 1% of signal RMS, tests/test_onnx_backend.py).
    """
    import os

    from .onnx_pipeline import load_executors

    if bf16_storage is None:
        env = os.getenv("TTS_ONNX_BF16")
        bf16_storage = (env == "1" if env is not None
                        else matmul_precision != "float32")
    return OnnxStageBackend(
        load_executors(onnx_dir, matmul_precision=matmul_precision,
                       bf16_storage=bf16_storage), cfg)
