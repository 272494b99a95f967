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
import time


import jax
import jax.numpy as jnp
import numpy as np

from ..config import TTSConfig
from ..frontend import UnicodeProcessor
from ..models import layers as L
from ..utils.timing import StageProfiler
from . import buckets, synthesis
from .longform import LongFormSynthesis


@dataclasses.dataclass
class VoiceStyle:
    """Pre-computed style tensors (reference ``Style``, py/helper.py:134-138):
    ttl [B, S, D], dp [B, S_dp, D_dp]."""

    ttl: np.ndarray
    dp: np.ndarray

    @property
    def batch(self) -> int:
        return self.ttl.shape[0]

    def fingerprint(self) -> bytes:
        """Content digest (cached per object) — the engine's device-style
        cache keys on this so fresh-but-identical VoiceStyle objects
        (tile/concat per request) still hit."""
        fp = getattr(self, "_fp", None)
        if fp is None:
            import hashlib

            h = hashlib.blake2b(digest_size=16)
            h.update(np.ascontiguousarray(self.ttl).view(np.uint8))
            h.update(np.ascontiguousarray(self.dp).view(np.uint8))
            fp = self._fp = h.digest()
        return fp

    def tile(self, n: int) -> "VoiceStyle":
        assert self.batch == 1
        return VoiceStyle(np.repeat(self.ttl, n, 0), np.repeat(self.dp, n, 0))

    def blend(self, other: "VoiceStyle", t: float) -> "VoiceStyle":
        """Linear interpolation in style-embedding space: t=0 -> self,
        t=1 -> other. Styles are precomputed speaker embeddings (reference
        §2.6), so convex blends yield intermediate voices — a capability
        the reference's fixed-preset loading never exposes."""
        if self.ttl.shape != other.ttl.shape or self.dp.shape != other.dp.shape:
            raise ValueError(
                f"style shapes differ: {self.ttl.shape}/{self.dp.shape} vs "
                f"{other.ttl.shape}/{other.dp.shape}")
        t = float(t)
        return VoiceStyle(
            ((1.0 - t) * self.ttl + t * other.ttl).astype(np.float32),
            ((1.0 - t) * self.dp + t * other.dp).astype(np.float32),
        )

    def take(self, idx) -> "VoiceStyle":
        return VoiceStyle(self.ttl[idx], self.dp[idx])


def parse_blend_spec(spec: str) -> tuple[str, str, float]:
    """Parse the 'A+B' / 'A+B:t' blended-voice syntax shared by the HTTP
    service and the CLI into (name_a, name_b, t). Raises ValueError on a
    malformed spec or out-of-range weight (t defaults to 0.5)."""
    body, _, t_str = spec.partition(":")
    a, _, b = body.partition("+")
    try:
        t = float(t_str) if t_str else 0.5
    except ValueError:
        raise ValueError(f"invalid blend weight in {spec!r}")
    if not a or not b or "+" in b or not (0.0 <= t <= 1.0):
        raise ValueError(
            f"invalid blend spec {spec!r} (use 'A+B' or 'A+B:t', t in [0, 1])")
    return a, b, t


@dataclasses.dataclass
class PendingBatch:
    """An in-flight fused-synthesis dispatch (infer_batch_begin). Holds the
    device handles plus everything infer_batch_end needs to resolve, retry
    on bucket overflow, and record metrics."""

    wav_dev: object
    dur_dev: object
    wav_src: object  # pre-sliced egress view (host-output path) or None
    dev_args: tuple
    text_mask: np.ndarray
    b_true: int
    t_bucket: int
    n_xfer: int
    total_step: int
    speed: float
    device_output: bool
    t_start: float
    n_chars: int


def _early_egress() -> bool:
    """Start the waveform device->host copy at DISPATCH time (default) so
    audio streams back the moment compute finishes instead of waiting for
    resolve()'s fetch request — worth one link round-trip per utterance on
    high-RTT device links. TTS_EARLY_EGRESS=0 opts out (A/B lever)."""
    import os

    return os.getenv("TTS_EARLY_EGRESS", "1") != "0"


def _tree_has_key(tree, key: str) -> bool:
    if isinstance(tree, dict):
        return key in tree or any(_tree_has_key(v, key) for v in tree.values())
    if isinstance(tree, (list, tuple)):
        return any(_tree_has_key(v, key) for v in tree)
    return False


class SynthesisEngine(LongFormSynthesis):
    def __init__(
        self,
        params: dict,
        cfg: TTSConfig,
        processor: UnicodeProcessor,
        *,
        precision: str | None = None,
        attn_fn=None,
        seed: int = 0,
        egress_format: str = "int16",
        mesh=None,
        fused_ffn: bool = False,
        backend=None,
    ):
        """``mesh``: optional jax.sharding.Mesh (axes 'data'/'model', see
        parallel.make_mesh). Params are placed with TP shardings (replicated
        when model=1) and every batch is sharded over the data axis; GSPMD
        compiles the collectives. Without a mesh, single-device jit.

        ``backend``: optional stage-program provider (text_fn / acoustic_fn /
        fused_fn with the synthesis.py signatures) replacing the native
        models — e.g. assets.onnx_backend.OnnxStageBackend, which composes
        the four REAL reference graphs into the same fused programs. All
        engine machinery (buckets, learned rate, style cache, pipelined
        dispatch, batcher) applies unchanged; ``params`` should then be
        ``backend.params``."""
        self.cfg = cfg
        self.processor = processor
        self.precision = precision or cfg.runtime.precision
        self.attn_fn = attn_fn or L.attention_core
        self.mesh = mesh
        self.backend = backend
        self._fused_ffn = fused_ffn
        if backend is not None and params is None:
            params = backend.params
        # NOTE: models.fuse_projections (merged QKV/KV matmuls) was measured
        # 2x SLOWER end-to-end on TPU — splitting the fused output
        # materializes [B,T,3D] and defeats XLA's consumer fusion of the
        # separate projections. The engine deliberately keeps params unfused.
        if (backend is None and self.precision == "int8"
                and not _tree_has_key(params, "w_q")):
            from ..models import quantize_params

            params = quantize_params(params)
        if mesh is not None:
            from ..parallel.mesh import shard_params

            self.params = shard_params(params, mesh)
            self._data_size = mesh.shape[cfg.runtime.data_axis]
        else:
            self.params = jax.tree_util.tree_map(jnp.asarray, params)
            self._data_size = 1
        self.profiler = StageProfiler()
        self.egress_format = egress_format
        self._key = jax.random.key(seed)
        # guards the engine's HOST-side mutable state (PRNG chain, learned
        # rate, style cache, lazy program builds) — the batcher thread and
        # windowed-streaming handler threads drive the same engine
        # concurrently. Deliberately NOT held across device dispatch/fetch:
        # that would serialize begin/end pipelining (XLA dispatch itself is
        # thread-safe).
        import threading

        self._host_mutex = threading.RLock()
        self._flow_fn = self._voc_win_fn = None  # built lazily (native only)
        if backend is not None:
            self._text_fn = backend.text_fn
            self._acoustic_fn = backend.acoustic_fn
            self._fused_fn = backend.fused_fn
        else:
            self._text_fn = synthesis.jit_text_stage(
                cfg, precision=self.precision, attn_fn=self.attn_fn
            )
            self._acoustic_fn = synthesis.jit_acoustic_stage(
                cfg, precision=self.precision, attn_fn=self.attn_fn,
                fused_ffn=fused_ffn,
            )
            self._fused_fn = synthesis.jit_synthesize_fused(
                cfg, precision=self.precision, attn_fn=self.attn_fn,
                fused_ffn=fused_ffn,
            )
        # host-side latent-bucket heuristic: the engine LEARNS the model's
        # observed seconds-per-char so padded latent length tracks reality
        # instead of a conservative constant — overpadding directly
        # multiplies flow+vocoder compute. Estimate = max over a recent
        # window (converges after ONE batch, no slow drift flipping buckets)
        # times a safety margin; overflow triggers a re-run (rare).
        # learned seconds-per-char, tracked PER TEXT-LENGTH BUCKET: short
        # texts run at a visibly higher sec/char than long ones (fixed
        # prosodic overhead), so a single max-over-recent-requests estimate
        # lets a short request inflate the next mid/long request's latent
        # bucket — measured r3: the mid protocol text sits at 255/256 frames
        # and one cross-text bump pushed every batch to T320 (-36%
        # throughput). Per-bucket windows are tight AND stable.
        self._spc_windows: dict[int, object] = {}
        self._spc_priors: dict[int, float] = self._load_rate_cache()
        self._spc_counts: dict[int, int] = {}  # real observations per bucket
        self._spc_default_prior = 1.0 / 11.0
        # Safety factor over the learned window-max sec/char when choosing
        # the latent bucket. The window max is already the worst case seen
        # for this text-length bucket and the ratcheted prior persists it
        # across processes; an undershoot on a truly novel text is caught
        # by the overflow-retry path (one slow batch, then the ratchet
        # learns it). 1.05 instead of 1.10 lands boundary texts one rung
        # lower on the ladder and trims the egress slice width. (A 240
        # bucket to exploit this at the ~150-char point measured SLOWER
        # than 256 — see config.latent_buckets — so the ladder is
        # unchanged; the tighter margin still helps wherever the rung
        # below is a power-of-two-friendly shape.)
        self._spc_margin = 1.05
        # device-resident styles: uploading the [B,S,D] style tensors on
        # every request costs host->device round-trips that dominate short-
        # utterance latency behind a slow link; identical (style, bucket)
        # pairs hit this cache instead (VERDICT r1 item 5)
        self._style_dev_cache: dict[int, tuple] = {}

    # persisted learned speaking rates (one per text-length bucket): a fresh
    # process otherwise spends its first requests on the conservative-prior
    # latent bucket (extra compiled programs that are never used again)
    def _rate_cache_path(self) -> str:
        import hashlib
        import os

        cfg_key = hashlib.md5(
            f"{self.cfg.chunk_size}:{self.cfg.sample_rate}:"
            f"{self.cfg.duration_predictor.dim}".encode()
        ).hexdigest()[:10]
        base = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/jax_comp_cache"),
        )
        return os.path.join(base, f"stpu_rates_{cfg_key}.json")

    def _load_rate_cache(self) -> dict[int, float]:
        import json

        try:
            with open(self._rate_cache_path()) as f:
                raw = json.load(f)
            return {int(k): float(v) for k, v in raw.items()
                    if 0.001 < float(v) < 1.0}
        except (OSError, ValueError, AttributeError, TypeError):
            return {}  # corrupted/hand-edited cache: start from defaults

    def _save_rate_cache(self) -> None:
        import json
        import os

        try:
            path = self._rate_cache_path()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            # write-then-rename: a concurrently starting process must never
            # read a torn file (it would silently discard the learned
            # priors and the shape-stable warm start they exist to provide)
            tmp = f"{path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump({str(k): round(v, 6)
                           for k, v in sorted(self._spc_priors.items())}, f)
            os.replace(tmp, path)
        except OSError:
            pass

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _next_key(self):
        with self._host_mutex:  # racing read-split-assign would hand two
            # requests the identical subkey (identical noise)
            self._key, sub = jax.random.split(self._key)
            return sub

    def _spc_window_for(self, l_bucket: int):
        """This text-length bucket's recent-rate window, created on first
        use SEEDED with the persisted prior: the estimate (and therefore the
        latent bucket + egress-slice width) is then IDENTICAL from batch 1
        across process restarts, so fresh-process traffic re-uses the last
        session's compiled programs instead of compiling a slightly-shifted
        shape (minutes per new shape through a remote-compile tunnel —
        measured r3: one drifted slice width cost a 284 s bench case). The
        seed ages out of the 16-deep window, after which the genuinely
        observed rate governs. Priors for unseen buckets inherit the largest
        SMALLER bucket's prior (rates fall with text length), else the
        conservative default."""
        with self._host_mutex:
            w = self._spc_windows.get(l_bucket)
            if w is None:
                from collections import deque

                prior = self._spc_priors.get(l_bucket)
                if prior is None:
                    smaller = [b for b in self._spc_priors if b <= l_bucket]
                    prior = (self._spc_priors[max(smaller)] if smaller
                             else self._spc_default_prior)
                w = self._spc_windows[l_bucket] = deque([prior], maxlen=16)
            return w

    def _spc_estimate(self, l_bucket: int) -> float:
        return max(self._spc_window_for(l_bucket))

    def _observe_rate(self, l_bucket: int, obs_spc: float) -> None:
        """Feed one observed seconds-per-char into the learned-rate state:
        window append, count, prior ratchet-up (1e-6 ceil grid the cache
        file round-trips exactly) and the poisoned-prior write-down once a
        FULL window of real observations sits well below it."""
        if getattr(self, "_rate_frozen", False):
            return
        import math

        with self._host_mutex:
            win = self._spc_window_for(l_bucket)
            win.append(obs_spc)
            self._spc_counts[l_bucket] = self._spc_counts.get(l_bucket, 0) + 1
            q = math.ceil(obs_spc * 1e6) / 1e6
            prior = self._spc_priors.get(l_bucket, 0.0)
            if q > prior:
                self._spc_priors[l_bucket] = q
                self._save_rate_cache()
            elif (self._spc_counts[l_bucket] >= win.maxlen
                  and prior > 0.0
                  and max(win) < prior * 0.9):
                self._spc_priors[l_bucket] = math.ceil(max(win) * 1e6) / 1e6
                self._save_rate_cache()

    def _pin_rate(self, rate: float = 1.0 / 11.0) -> None:
        """Test/bench hook: force a uniform learned rate — every text-length
        bucket derives its latent bucket and slice width from ``rate``
        (exact-match tests need two engines on the SAME noise grid; the
        persisted priors would otherwise steer them apart)."""
        self._spc_windows = {}
        self._spc_priors = {}
        self._spc_counts = {}
        self._spc_default_prior = rate

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

    def _device_style(self, style: "VoiceStyle", b_bucket: int):
        """Batch-padded (style_dp, style_ttl) as device-resident arrays,
        cached by CONTENT fingerprint + bucket. Callers routinely construct
        fresh VoiceStyle objects per request (style.tile in __call__, row
        concatenation in the batcher), so identity keying would miss every
        time; the fingerprint (~1 ms to hash 3 MB, cached on the object) is
        what makes repeat presets hit instead of re-uploading."""
        key = (style.fingerprint(), b_bucket)
        with self._host_mutex:
            hit = self._style_dev_cache.pop(key, None)
            if hit is not None:
                self._style_dev_cache[key] = hit  # LRU: re-insert as newest
                return hit
        ttl, dp = self._pad_batch([style.ttl, style.dp], b_bucket)
        dp_dev = jnp.asarray(dp, jnp.float32)  # upload outside the lock —
        ttl_dev = jnp.asarray(ttl, jnp.float32)  # idempotent on a miss race
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            dp_dev, ttl_dev = shard_batch(self.mesh, dp_dev, ttl_dev)
        with self._host_mutex:
            while len(self._style_dev_cache) >= 32:  # bound resident HBM
                self._style_dev_cache.pop(next(iter(self._style_dev_cache)))
            self._style_dev_cache[key] = (dp_dev, ttl_dev)
        return dp_dev, ttl_dev

    def _prepare_inputs(self, text_list, lang_list, style,
                        pre_normalized: bool = False):
        """Frontend + bucketing + device placement shared by the fused and
        injected-noise paths. Returns (dev_args, text_mask, l_true,
        b_true, b_bucket)."""
        rt = self.cfg.runtime
        b_true = len(text_list)
        with self.profiler.stage("frontend"):
            text_ids, text_mask3 = self.processor(
                text_list, lang_list, pre_normalized=pre_normalized)
            l_true = text_ids.shape[1]
            l_bucket = buckets.pick_bucket(l_true, rt.text_buckets)
            pad_l = l_bucket - l_true
            text_ids = np.pad(text_ids, ((0, 0), (0, pad_l)))
            text_mask = np.pad(text_mask3[:, 0, :], ((0, 0), (0, pad_l)))

        b_bucket = buckets.pick_bucket(b_true, rt.batch_buckets)
        if b_bucket % self._data_size:
            b_bucket = -(-b_bucket // self._data_size) * self._data_size
        text_ids, text_mask = self._pad_batch([text_ids, text_mask], b_bucket)
        ids_dev = jnp.asarray(text_ids, jnp.int32)
        mask_dev = jnp.asarray(text_mask, jnp.float32)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            ids_dev, mask_dev = shard_batch(self.mesh, ids_dev, mask_dev)
        sdp_dev, sttl_dev = self._device_style(style, b_bucket)
        dev_args = (ids_dev, mask_dev, sdp_dev, sttl_dev)
        return dev_args, text_mask, l_true, b_true, b_bucket

    def infer_batch(
        self,
        text_list: list[str],
        lang_list: list[str],
        style: VoiceStyle,
        total_step: int = 5,
        speed: float = 1.05,
        noise: np.ndarray | None = None,
        device_output: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Synthesize a batch. Returns (wav [B, T*chunk] f32 np — PADDED, trim
        to int(sr * duration[b]) like the reference —, duration [B] f32)."""
        assert len(text_list) == style.batch, (
            "Number of texts must match number of style vectors"
        )
        if not text_list:
            return (np.zeros((0, 0), np.float32), np.zeros((0,), np.float32))
        if noise is not None:
            dev_args, text_mask, _l, b_true, b_bucket = self._prepare_inputs(
                text_list, lang_list, style)
            return self._infer_injected_noise(
                dev_args, text_mask, noise, b_true, b_bucket,
                total_step, speed,
            )
        return self.infer_batch_end(self.infer_batch_begin(
            text_list, lang_list, style, total_step, speed,
            device_output=device_output,
        ))

    def infer_batch_begin(
        self,
        text_list: list[str],
        lang_list: list[str],
        style: VoiceStyle,
        total_step: int = 5,
        speed: float = 1.05,
        *,
        device_output: bool = False,
        pre_normalized: bool = False,
    ) -> "PendingBatch":
        """Dispatch a fused-synthesis batch WITHOUT waiting for results.

        The duration device->host copy starts streaming immediately; resolve
        with infer_batch_end. Behind a high-RTT device link every resolved
        batch costs one synchronous round-trip — callers that keep ONE
        PendingBatch in flight while dispatching the next (bench harness,
        continuous batcher) overlap that round-trip with device compute.
        A plain infer_batch call is begin+end back-to-back."""
        assert len(text_list) == style.batch, (
            "Number of texts must match number of style vectors"
        )
        assert text_list, "infer_batch_begin requires a non-empty batch"
        if not (speed > 0):  # speed=0 would divide by zero in the latent
            # estimate; negative speed produces garbage durations
            raise ValueError(f"speed must be > 0, got {speed}")
        t_start = time.perf_counter()
        rt = self.cfg.runtime
        chunk = self.cfg.chunk_size
        sr = self.cfg.sample_rate
        dev_args, text_mask, l_true, b_true, _b_bucket = self._prepare_inputs(
            text_list, lang_list, style, pre_normalized=pre_normalized)

        # production path: one fused program, no mid-pipeline sync.
        # t bucket from the learned sec/char estimate; the returned
        # (unclamped) duration exposes overflows, which re-run bigger.
        spc_est = self._spc_estimate(text_mask.shape[1])
        est_secs = l_true * spc_est * self._spc_margin / min(speed, 1.0)
        t_guess = buckets.latent_len_for_duration(est_secs, sr, chunk)
        t_bucket = buckets.pick_bucket(t_guess, rt.latent_buckets)
        # quantize the egress slice to 8-frame steps: every distinct slice
        # width is its own compiled (tiny) program, and the learned-rate
        # estimate drifts — frame-granular widths would churn compiles.
        # The slice uses a LEANER margin than the bucket choice (1.04 vs
        # 1.1): an undershoot only costs the rare tail fetch, while every
        # surplus frame is wasted device->host bytes on a ~10-40 MB/s
        # tunnel where singles latency is egress-bound (probe r3)
        t_slice = buckets.latent_len_for_duration(
            est_secs * (1.04 / self._spc_margin), sr, chunk)
        n_xfer = min(t_bucket, buckets.quantize_up(max(t_slice, 1), 8))
        with self.profiler.stage("fused_synthesis"):
            wav_dev, dur_dev = self._fused_fn(
                self.params, *dev_args, self._next_key(),
                jnp.float32(speed), int(total_step), int(t_bucket),
                self.egress_format,
            )
        # start BOTH device->host copies at dispatch time: the data then
        # streams back as soon as compute finishes instead of waiting for
        # end()'s fetch request — on a high-RTT device link that request
        # costs a full round-trip per resolved batch (probe r3: ~35 ms here,
        # the dominant term in single-utterance latency)
        wav_src = None
        if not device_output:
            wav_src = (wav_dev if n_xfer >= t_bucket
                       else wav_dev[:, : n_xfer * chunk])
        try:
            dur_dev.copy_to_host_async()
            if wav_src is not None and _early_egress():
                wav_src.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass  # backend without async copies: end() fetches synchronously
        return PendingBatch(
            wav_dev=wav_dev, dur_dev=dur_dev, wav_src=wav_src,
            dev_args=dev_args,
            text_mask=text_mask, b_true=b_true, t_bucket=t_bucket,
            n_xfer=n_xfer, total_step=total_step, speed=speed,
            device_output=device_output, t_start=t_start,
            n_chars=sum(len(t) for t in text_list),
        )

    def infer_batch_end(
        self, pending: "PendingBatch"
    ) -> tuple[np.ndarray, np.ndarray]:
        """Resolve an in-flight dispatch: fetch the duration (and waveform on
        the host-output path), handle latent-bucket overflow re-runs, update
        the learned speaking rate, record metrics."""
        chunk = self.cfg.chunk_size
        sr = self.cfg.sample_rate
        rt = self.cfg.runtime
        b_true = pending.b_true
        device_output = pending.device_output
        speed = pending.speed
        wav_dev, dur_dev = pending.wav_dev, pending.dur_dev
        wav_src = pending.wav_src
        t_bucket, n_xfer = pending.t_bucket, pending.n_xfer
        for _attempt in range(4):
            if device_output:
                # benchmark / pod-egress path: waveform stays device-resident,
                # only the tiny duration vector crosses to the host
                with self.profiler.stage("duration_sync"):
                    dur = np.asarray(dur_dev)
            else:
                # ONE host round-trip for both outputs (each sync costs ~35 ms
                # through the device tunnel). Transfer only the frames the
                # duration estimate (incl. margin) predicts exist — bucket
                # padding beyond that is garbage bytes on a slow link; the
                # rare underestimate fetches the missing tail below. begin()
                # already sliced wav_src and started both async copies.
                if wav_src is None:  # overflow re-run below resets it
                    wav_src = (wav_dev if n_xfer >= t_bucket
                               else wav_dev[:, : n_xfer * chunk])
                with self.profiler.stage("egress"):
                    wav_host, dur = jax.device_get((wav_src, dur_dev))
            t_needed = int(
                ((dur[:b_true] * sr).astype(np.int64).max() + chunk - 1) // chunk
            )
            if t_needed <= t_bucket:
                if not device_output and t_needed > n_xfer:
                    # sliced transfer undershot the true duration: fetch the
                    # missing tail (costs one extra round-trip, rare — the
                    # estimate carries a 1.1x margin)
                    self.profiler.bump("egress_tail_fetches")
                    with self.profiler.stage("egress"):
                        tail = jax.device_get(
                            wav_dev[:, n_xfer * chunk : t_needed * chunk]
                        )
                    wav_host = np.concatenate([wav_host, tail], axis=1)
                break
            self.profiler.bump("bucket_overflows")
            from ..utils.logging import default_logger as log

            log.warning("latent_bucket_overflow", needed=t_needed,
                        bucket=t_bucket, attempt=_attempt + 1)
            t_bucket = buckets.pick_bucket(t_needed, rt.latent_buckets)
            n_xfer = min(t_bucket, buckets.quantize_up(t_needed, 8))
            with self.profiler.stage("fused_synthesis"):
                wav_dev, dur_dev = self._fused_fn(
                    self.params, *pending.dev_args, self._next_key(),
                    jnp.float32(speed), int(pending.total_step),
                    int(t_bucket), self.egress_format,
                )
            wav_src = None  # re-slice at the new bucket on the next pass
        else:
            # duration is deterministic per input, so one retry always fits;
            # reaching here means something is deeply wrong — returning
            # silently clipped audio would hide it (VERDICT r1 weak #5)
            self.profiler.bump("bucket_overflow_exhausted")
            raise RuntimeError(
                f"latent bucket overflow persisted after retries "
                f"(needed {t_needed} > bucket {t_bucket}); refusing to "
                f"return truncated audio"
            )
        # update the learned sec/char from this batch's worst case — ONCE
        # per request (outside the overflow-retry loop: duration is
        # deterministic per input, so retries would append the identical
        # observation twice and double-count toward the full-window
        # write-down). Monotone ratchet + full-window write-down: a fresh
        # process re-derives the exact shapes already compiled, and a
        # one-off outlier cannot inflate a bucket's allocation forever.
        row_chars = np.maximum(
            np.asarray(pending.text_mask)[:b_true].sum(axis=1), 1.0
        )
        obs_spc = float((dur[:b_true] * speed / row_chars).max())
        self._observe_rate(pending.text_mask.shape[1], obs_spc)
        audio_s = float(np.sum(dur[:b_true]))
        n_chars = pending.n_chars
        if device_output:
            # throughput is known now; per-request latency is recorded by the
            # caller (batcher egress thread) when audio lands on the host
            self.profiler.record_throughput(
                audio_s, n_chars, time.perf_counter() - pending.t_start
            )
            return wav_dev[:b_true], dur[:b_true]
        wav_np = self._decode_egress(wav_host[:b_true])
        self.profiler.record_result(
            audio_s, n_chars, time.perf_counter() - pending.t_start
        )
        return wav_np, dur[:b_true]

    def _infer_injected_noise(
        self, dev_args, text_mask, noise, b_true, b_bucket, total_step, speed
    ):
        """Parity path (noise-as-input per SURVEY.md §2.2): two-stage with an
        explicit duration sync so the latent grid matches the caller's noise."""
        rt = self.cfg.runtime
        chunk = self.cfg.chunk_size
        sr = self.cfg.sample_rate
        with self.profiler.stage("text_stage"):
            dur_dev, emb = self._text_fn(
                self.params, *dev_args, jnp.float32(speed)
            )
            dur = np.asarray(dur_dev)
        with self.profiler.stage("latent_setup"):
            wav_lengths = (dur * sr).astype(np.int64)
            latent_lengths = (wav_lengths + chunk - 1) // chunk
            t_true = int(latent_lengths[:b_true].max())
            t_bucket = buckets.pick_bucket(t_true, rt.latent_buckets)
            frame = np.arange(t_bucket)[None, :]
            latent_mask = (frame < latent_lengths[:, None]).astype(np.float32)
            noise_arr = np.zeros(
                (b_bucket, t_bucket, self.cfg.latent_channels), np.float32
            )
            t_copy = min(noise.shape[1], t_bucket)
            noise_arr[: noise.shape[0], :t_copy] = noise[:, :t_copy]
        with self.profiler.stage("acoustic_stage"):
            wav = self._acoustic_fn(
                self.params, emb, dev_args[3], dev_args[1],
                jnp.asarray(latent_mask, jnp.float32),
                jnp.asarray(noise_arr), int(total_step),
            )
        with self.profiler.stage("egress"):
            wav_np = np.asarray(wav)[:b_true]
        return wav_np, dur[:b_true]

    def warmup(
        self,
        *,
        batch_sizes: tuple[int, ...] | None = None,
        text_buckets: tuple[int, ...] | None = None,
        total_steps: tuple[int, ...] = (2, 5),
        progress=None,
    ) -> int:
        """Pre-compile the fused program over the common bucket lattice so
        live traffic never pays a first-shape XLA compile (new shapes cost
        seconds locally, minutes through a remote-compile tunnel). Returns
        the number of programs dispatched. Compiles persist in the on-disk
        cache, so across restarts this is a fast cache load."""
        rt = self.cfg.runtime
        # `is None` (not falsy-or): an explicitly empty tuple means "warm
        # nothing for this dimension", not "use the full default lattice"
        bss = (tuple(b for b in rt.batch_buckets if b <= 32)
               if batch_sizes is None else batch_sizes)
        lbs = rt.text_buckets[:3] if text_buckets is None else text_buckets
        rng = np.random.default_rng(0)
        # warmup batches are synthetic: keep them out of /metrics (throwaway
        # profiler) AND out of the learned speaking-rate window/on-disk rate
        # cache — "aaaa…" rows are not speech, and a poisoned rate picks an
        # undersized latent bucket for the first LIVE request (which then
        # pays a fresh overflow-retry compile, the very thing warmup exists
        # to prevent)
        live_profiler = self.profiler
        live_windows = self._spc_windows
        self.profiler = StageProfiler()
        self._spc_windows = {}
        self._rate_frozen = True
        try:
            n = self._warmup_lattice(bss, lbs, total_steps, progress, rng)
        finally:
            self.profiler = live_profiler
            self._spc_windows = live_windows
            self._rate_frozen = False
        return n

    def _warmup_lattice(self, bss, lbs, total_steps, progress, rng) -> int:
        n = 0
        for b in bss:
            style = VoiceStyle(
                rng.standard_normal(
                    (1, self.cfg.ttl.style.n_style,
                     self.cfg.ttl.style.style_value_dim)).astype(np.float32),
                rng.standard_normal(
                    (1, self.cfg.dp.style.n_style,
                     self.cfg.dp.style.style_value_dim)).astype(np.float32),
            ).tile(b)
            for lb in lbs:
                # a text that lands exactly in bucket lb (tags cost 9 chars)
                text = "a" * max(1, lb - 12) + "."
                for steps in total_steps:
                    self.infer_batch([text] * b, ["en"] * b, style,
                                     total_step=steps, device_output=True)
                    n += 1
                    if progress:
                        progress(n, len(bss) * len(lbs) * len(total_steps))
        return n

    # ------------------------------------------------------------------
    # public API (mirrors reference TextToSpeech, py/helper.py:217-254):
    # __call__ / batch / stream / trim come from LongFormSynthesis
    # ------------------------------------------------------------------

    def infer_with_progress(
        self,
        text: str,
        lang: str,
        style: VoiceStyle,
        total_step: int = 5,
        speed: float = 1.05,
        progress_callback=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Single-utterance synthesis with a per-denoise-step callback
        (reference web port behavior, web/helper.js:215-218): the Euler loop
        runs step-at-a-time through a jitted single-step program so
        ``progress_callback(step, total_step)`` fires between steps. Slower
        than the fused path (one dispatch per step) — use for interactive
        UIs, not serving."""
        assert style.batch == 1
        if not hasattr(self, "_step_fn") and self.backend is not None:
            # backend-provided step programs (cross-attention cache is
            # backend-specific; None means "no cache")
            self._cross_fn, self._step_fn, self._vocoder_fn = (
                self.backend.progress_fns()
            )
        if not hasattr(self, "_step_fn"):
            from ..models import vector_estimator, vocoder as _vocoder

            _dt = jnp.float32 if self.precision == "f32" else jnp.bfloat16

            from ..models import layers as _L

            # STATIC at closure-build time: the cache layout flag must not
            # travel through the jit boundary inside the cache pytree (a
            # Python bool leaf would become a tracer and mha's layout
            # branch would fail)
            _kt = (_L.kt_cache_enabled()
                   and self.attn_fn is _L.attention_core)

            def _cross(params, emb, sttl, tmask):
                mm, kvs, _flag = vector_estimator.precompute_cross(
                    params["vector_estimator"], self.cfg, emb, sttl, tmask,
                    dtype=_dt, transposed=_kt,
                )
                return mm, kvs  # flag re-attached statically in _one_step

            def _one_step(params, x, emb, sttl, tmask, lmask, cur, tot,
                          cache):
                # cross-attention K/V precomputed ONCE (each step here is a
                # separate dispatch, so XLA cannot hoist across steps the
                # way the fused fori_loop program can)
                cache3 = None if cache is None else (*cache, _kt)
                return vector_estimator.step(
                    params["vector_estimator"], self.cfg, x, emb, sttl,
                    tmask, lmask, cur, tot, dtype=_dt, attn_fn=self.attn_fn,
                    cross_cache=cache3,
                )

            def _voc(params, x, fm):
                # batch-max frame mask: without it, bucket-padded frames
                # (conv-bias nonzero) bleed a dilated-conv halo into the
                # valid audio tail — same fix as the fused path
                # (synthesis.py acoustic tail) and the graph backend
                return _vocoder.apply(params["vocoder"], self.cfg, x,
                                      frame_mask=fm, dtype=_dt)

            self._cross_fn = jax.jit(_cross)
            self._step_fn = jax.jit(_one_step)
            self._vocoder_fn = jax.jit(_voc)

        rt = self.cfg.runtime
        chunk = self.cfg.chunk_size
        sr = self.cfg.sample_rate
        ids, mask3 = self.processor([text], [lang])
        l_bucket = buckets.pick_bucket(ids.shape[1], rt.text_buckets)
        ids = np.pad(ids, ((0, 0), (0, l_bucket - ids.shape[1])))
        mask = np.pad(mask3[:, 0, :], ((0, 0), (0, l_bucket - mask3.shape[2])))
        dur_dev, emb = self._text_fn(
            self.params, jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, jnp.float32), jnp.asarray(style.dp, jnp.float32),
            jnp.asarray(style.ttl, jnp.float32), jnp.float32(speed),
        )
        dur = np.asarray(dur_dev)
        t_lat = buckets.latent_len_for_duration(float(dur[0]), sr, chunk)
        t_bucket = buckets.pick_bucket(t_lat, rt.latent_buckets)
        lmask = (np.arange(t_bucket)[None, :] < t_lat).astype(np.float32)
        xt = jax.random.normal(
            self._next_key(), (1, t_bucket, self.cfg.latent_channels)
        ) * jnp.asarray(lmask)[:, :, None]
        sttl = jnp.asarray(style.ttl, jnp.float32)
        tmask = jnp.asarray(mask, jnp.float32)
        lmask_dev = jnp.asarray(lmask)
        tot = jnp.full((1,), float(total_step), jnp.float32)
        cache = (self._cross_fn(self.params, emb, sttl, tmask)
                 if self._cross_fn is not None else None)
        for step in range(total_step):
            xt = self._step_fn(
                self.params, xt, emb, sttl, tmask, lmask_dev,
                jnp.full((1,), float(step), jnp.float32), tot, cache,
            )
            if progress_callback is not None:
                # async dispatch would fire all callbacks instantly; progress
                # means COMPLETED steps, so sync before reporting
                jax.block_until_ready(xt)
                progress_callback(step + 1, total_step)
        # batch-MAX frame mask, like _acoustic_stage — correct for any
        # batch size, though this progress path always runs B=1 today
        # (ADVICE r4: lmask[0] would mis-mask other rows if reused batched)
        wav = np.asarray(self._vocoder_fn(
            self.params, xt,
            jnp.asarray(lmask, jnp.float32).max(axis=0)))
        return wav, dur

    def _vocode_stream(self, text: str, lang: str, style, total_step: int,
                       speed: float, window_frames: int):
        """Sub-chunk streaming core (native backend only).

        Schedule (every step before the first yield is ASYNC dispatch —
        exactly ONE device round-trip happens before first audio):
          1. ONE fused text+flow program (latent stays device-resident;
             t bucket from the learned rate like infer_batch_begin),
          2. dispatch vocode window 0,
          3. fetch (window 0, duration) in a single device_get,
          4. yield window 0; dispatch the remaining windows and fetch them
             in doubling groups (streaming granularity without paying one
             RTT per window).

        Yields (wav [n] f32, seconds, chunk_end) — see
        LongFormSynthesis.stream_windows."""
        from ..models.vocoder import receptive_field_frames

        with self._host_mutex:  # two handler threads must not double-build
            if self._voc_win_fn is None:
                self._flow_fn = synthesis.jit_flow_fused(
                    self.cfg, precision=self.precision, attn_fn=self.attn_fn,
                    fused_ffn=self._fused_ffn)
                self._voc_win_fn = synthesis.jit_vocode_window(
                    self.cfg, precision=self.precision)
        rt = self.cfg.runtime
        chunk = self.cfg.chunk_size
        sr = self.cfg.sample_rate
        halo = receptive_field_frames(self.cfg)
        t0 = time.perf_counter()
        dev_args, text_mask, l_true, _b, _bb = self._prepare_inputs(
            [text], [lang], style)
        spc = self._spc_estimate(dev_args[0].shape[1])
        est = l_true * spc * self._spc_margin / min(speed, 1.0)
        t_bucket = buckets.pick_bucket(
            buckets.latent_len_for_duration(est, sr, chunk),
            rt.latent_buckets)
        for _attempt in range(4):
            with self.profiler.stage("fused_synthesis"):
                xt, dur_dev, fmask = self._flow_fn(
                    self.params, *dev_args, self._next_key(),
                    jnp.float32(speed), int(total_step), int(t_bucket))
            w = min(int(window_frames), t_bucket)
            xt_pad = jnp.pad(xt, ((0, 0), (halo, halo), (0, 0)))
            mask_pad = jnp.pad(fmask, (halo, halo))

            def win(k0):
                start = max(0, min(k0, t_bucket - w))
                return k0, start, self._voc_win_fn(
                    self.params, xt_pad, mask_pad, jnp.int32(start), w,
                    halo, self.egress_format)

            first = win(0)
            if _early_egress():
                try:  # start both copies now: first audio streams back the
                    # moment the window finishes, no fetch-request round-trip
                    dur_dev.copy_to_host_async()
                    first[2].copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
            with self.profiler.stage("egress"):
                w0_np, dur = jax.device_get((first[2], dur_dev))
            wav_len = int(float(dur[0]) * sr)
            t_true = max(1, (wav_len + chunk - 1) // chunk)
            if t_true <= t_bucket:
                break
            self.profiler.bump("bucket_overflows")
            t_bucket = buckets.pick_bucket(t_true, rt.latent_buckets)
        else:
            raise RuntimeError("latent bucket overflow persisted in "
                               "windowed streaming")
        # feed the learned rate like infer_batch_end does — a stream-only
        # server must also learn away its overflow re-runs
        n_chars = max(float(np.asarray(text_mask)[0].sum()), 1.0)
        self._observe_rate(dev_args[0].shape[1],
                           float(dur[0]) * speed / n_chars)
        emitted = 0

        def emit(k0, start, wav_np):
            nonlocal emitted
            off = (k0 - start) * chunk
            n_valid = min(wav_len - emitted, w * chunk - off)
            piece = self._decode_egress(wav_np[:1])[0, off: off + n_valid]
            emitted += n_valid
            if emitted >= wav_len:
                self.profiler.record_result(
                    float(dur[0]), len(text), time.perf_counter() - t0)
            return piece, n_valid / sr, emitted >= wav_len

        yield emit(first[0], first[1], w0_np)
        rest = [win(k0) for k0 in range(w, t_true, w)]
        # fetch in doubling groups: few round-trips, steady client flow
        i, group = 0, 1
        while i < len(rest):
            batch = rest[i: i + group]
            i += len(batch)
            group *= 2
            with self.profiler.stage("egress"):
                fetched = jax.device_get(tuple(h for *_k, h in batch))
            for (k0, start, _h), wav_np in zip(batch, fetched):
                yield emit(k0, start, wav_np)

    def _decode_egress(self, wav_np: np.ndarray) -> np.ndarray:
        if wav_np.dtype == np.int16:
            return wav_np.astype(np.float32) / 32767.0
        if wav_np.dtype == np.uint8:
            from ..utils.mulaw import decode

            return decode(wav_np)
        return wav_np

    def to_host(self, wav_dev) -> np.ndarray:
        """Transfer a device waveform (device_output=True result) to a host
        f32 array, undoing the egress quantization (int16 or mu-law)."""
        return self._decode_egress(np.asarray(wav_dev))
