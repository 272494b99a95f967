"""Host-side synthesis engine.

Replaces the reference's ``TextToSpeech`` orchestration class
(py/helper.py:140-254) with a TPU-shaped design:

  * two compiled stages with one tiny host transfer between them
    (see synthesis.py) instead of 3 + total_step ORT calls;
  * (B, L, T) bucket ladders bound the number of compiled programs;
  * long-form chunks are synthesized as ONE BATCH through the acoustic
    stage (the reference loops B=1 per chunk, py/helper.py:233-244);
  * noise is generated on-device from a per-request key (production) or
    injected (parity harness — noise-as-input per SURVEY.md §2.2).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TTSConfig
from ..frontend import UnicodeProcessor, chunk_text, max_len_for_lang
from ..models import layers as L
from ..utils.timing import StageProfiler
from . import buckets, stitch, synthesis


@dataclasses.dataclass
class VoiceStyle:
    """Pre-computed style tensors (reference ``Style``, py/helper.py:134-138):
    ttl [B, S, D], dp [B, S_dp, D_dp]."""

    ttl: np.ndarray
    dp: np.ndarray

    @property
    def batch(self) -> int:
        return self.ttl.shape[0]

    def tile(self, n: int) -> "VoiceStyle":
        assert self.batch == 1
        return VoiceStyle(np.repeat(self.ttl, n, 0), np.repeat(self.dp, n, 0))

    def take(self, idx) -> "VoiceStyle":
        return VoiceStyle(self.ttl[idx], self.dp[idx])


class SynthesisEngine:
    def __init__(
        self,
        params: dict,
        cfg: TTSConfig,
        processor: UnicodeProcessor,
        *,
        precision: str | None = None,
        attn_fn=None,
        seed: int = 0,
        donate_noise: bool = False,
    ):
        self.cfg = cfg
        self.processor = processor
        self.precision = precision or cfg.runtime.precision
        self.attn_fn = attn_fn or L.attention_core
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.profiler = StageProfiler()
        self._key = jax.random.key(seed)
        self._text_fn = synthesis.jit_text_stage(
            cfg, precision=self.precision, attn_fn=self.attn_fn
        )
        self._acoustic_fn = synthesis.jit_acoustic_stage(
            cfg, precision=self.precision, attn_fn=self.attn_fn
        )
        self._noise_fn = jax.jit(
            lambda key, b, t: jax.random.normal(
                key, (b, t, cfg.latent_channels), jnp.float32
            ),
            static_argnums=(1, 2),
        )

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _pad_batch(self, arrs: list[np.ndarray], b_bucket: int) -> list[np.ndarray]:
        """Pad batch dim by repeating row 0 (sliced off after compute)."""
        out = []
        for a in arrs:
            b = a.shape[0]
            if b < b_bucket:
                pad = np.repeat(a[:1], b_bucket - b, axis=0)
                a = np.concatenate([a, pad], axis=0)
            out.append(a)
        return out

    def infer_batch(
        self,
        text_list: list[str],
        lang_list: list[str],
        style: VoiceStyle,
        total_step: int = 5,
        speed: float = 1.05,
        noise: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Synthesize a batch. Returns (wav [B, T*chunk] f32 np — PADDED, trim
        to int(sr * duration[b]) like the reference —, duration [B] f32)."""
        assert len(text_list) == style.batch, (
            "Number of texts must match number of style vectors"
        )
        b_true = len(text_list)
        rt = self.cfg.runtime

        with self.profiler.stage("frontend"):
            texts_norm_len = max(
                len(t) + 9 for t in text_list
            )  # crude upper bound before tokenize; real length set below
            text_ids, text_mask3 = self.processor(text_list, lang_list)
            l_true = text_ids.shape[1]
            l_bucket = buckets.pick_bucket(l_true, rt.text_buckets)
            pad_l = l_bucket - l_true
            text_ids = np.pad(text_ids, ((0, 0), (0, pad_l)))
            text_mask = np.pad(text_mask3[:, 0, :], ((0, 0), (0, pad_l)))

        b_bucket = buckets.pick_bucket(b_true, rt.batch_buckets)
        text_ids, text_mask, style_ttl, style_dp = self._pad_batch(
            [text_ids, text_mask, style.ttl, style.dp], b_bucket
        )

        with self.profiler.stage("text_stage"):
            dur_dev, emb = self._text_fn(
                self.params,
                jnp.asarray(text_ids, jnp.int32),
                jnp.asarray(text_mask, jnp.float32),
                jnp.asarray(style_dp, jnp.float32),
                jnp.asarray(style_ttl, jnp.float32),
                jnp.float32(speed),
            )
            dur = np.asarray(dur_dev)  # tiny [B] transfer — the ONLY mid sync

        with self.profiler.stage("latent_setup"):
            chunk = self.cfg.chunk_size
            sr = self.cfg.sample_rate
            wav_lengths = (dur * sr).astype(np.int64)
            latent_lengths = (wav_lengths + chunk - 1) // chunk
            t_true = int(latent_lengths[:b_true].max())
            t_bucket = buckets.pick_bucket(t_true, rt.latent_buckets)
            frame = np.arange(t_bucket)[None, :]
            latent_mask = (frame < latent_lengths[:, None]).astype(np.float32)
            if noise is not None:
                noise_arr = np.zeros(
                    (b_bucket, t_bucket, self.cfg.latent_channels), np.float32
                )
                noise_arr[: noise.shape[0], : noise.shape[1]] = noise
                noise_dev = jnp.asarray(noise_arr)
            else:
                noise_dev = self._noise_fn(self._next_key(), b_bucket, t_bucket)

        with self.profiler.stage("acoustic_stage"):
            wav = self._acoustic_fn(
                self.params,
                emb,
                jnp.asarray(style_ttl, jnp.float32),
                jnp.asarray(text_mask, jnp.float32),
                jnp.asarray(latent_mask, jnp.float32),
                noise_dev,
                int(total_step),
            )

        with self.profiler.stage("egress"):
            wav_np = np.asarray(wav)[:b_true]

        return wav_np, dur[:b_true]

    # ------------------------------------------------------------------
    # public API (mirrors reference TextToSpeech, py/helper.py:217-254)
    # ------------------------------------------------------------------

    def __call__(
        self,
        text: str,
        lang: str,
        style: VoiceStyle,
        total_step: int = 5,
        speed: float = 1.05,
        silence_duration: float = 0.3,
        crossfade_duration: float = 0.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Single-utterance long-form synthesis: chunk, synthesize all chunks
        as one batch, stitch. Returns (wav [1, T] np, duration [1] np) like
        the reference __call__ (py/helper.py:217-244)."""
        assert style.batch == 1, (
            "Single speaker text to speech only supports single style"
        )
        chunks = chunk_text(text, max_len=max_len_for_lang(lang))
        if not chunks:
            return np.zeros((1, 0), np.float32), np.zeros((1,), np.float32)
        n = len(chunks)
        wavs, durs = self.infer_batch(
            chunks, [lang] * n, style.tile(n), total_step, speed
        )
        joined, total = stitch.stitch(
            [wavs[i] for i in range(n)],
            [float(durs[i]) for i in range(n)],
            self.cfg.sample_rate,
            silence_duration=silence_duration,
            crossfade_duration=crossfade_duration,
        )
        return joined[None, :], np.array([total], np.float32)

    def batch(
        self,
        text_list: list[str],
        lang_list: list[str],
        style: VoiceStyle,
        total_step: int = 5,
        speed: float = 1.05,
    ) -> tuple[np.ndarray, np.ndarray]:
        return self.infer_batch(text_list, lang_list, style, total_step, speed)

    # convenience: reference example trims at save time (py/example_onnx.py:113)
    def trim(self, wav: np.ndarray, duration: np.ndarray) -> list[np.ndarray]:
        sr = self.cfg.sample_rate
        return [
            wav[b, : int(sr * float(np.atleast_1d(duration)[b]))]
            for b in range(wav.shape[0])
        ]
