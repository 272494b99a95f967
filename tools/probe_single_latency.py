#!/usr/bin/env python
"""Phase-level probe of the single-utterance dispatch path on the TPU.

Times each host-visible step of ``engine.batch([text], ...)`` separately so
tunnel round-trips can be attributed: frontend, h2d transfers, fused
dispatch, the egress slice program, and the device->host fetch. Run on the
chip (no --platform): ``python tools/probe_single_latency.py``.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from supertonic_tpu.utils.jaxenv import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from supertonic_tpu import TTS  # noqa: E402
from supertonic_tpu.bench import SHORT_TEXT  # noqa: E402
from supertonic_tpu.engine import buckets  # noqa: E402


def main():
    tts = TTS()
    engine = tts.engine
    style = tts.get_voice_style("M1")
    text, lang = SHORT_TEXT, "en"

    # warm everything (compiles + style cache + learned rate)
    for _ in range(3):
        engine.batch([text], [lang], style, 2, 1.05)

    def t(label, fn, n=5):
        vals = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            vals.append((time.perf_counter() - t0) * 1e3)
        print(f"{label:28s} med={np.median(vals):7.2f} ms  "
              f"min={min(vals):7.2f}  max={max(vals):7.2f}")
        return out

    print(f"device: {jax.devices()[0]}")

    # end-to-end
    t("e2e engine.batch", lambda: engine.batch([text], [lang], style, 2, 1.05))

    # phases
    rt = engine.cfg.runtime
    ids, mask3 = engine.processor([text], [lang])
    l_bucket = buckets.pick_bucket(ids.shape[1], rt.text_buckets)
    ids_p = np.pad(ids, ((0, 0), (0, l_bucket - ids.shape[1])))
    mask_p = np.pad(mask3[:, 0, :], ((0, 0), (0, l_bucket - ids.shape[1])))

    t("frontend (host)", lambda: engine.processor([text], [lang]))

    def h2d_pair():
        a = jnp.asarray(ids_p, jnp.int32)
        b = jnp.asarray(mask_p, jnp.float32)
        a.block_until_ready(); b.block_until_ready()
        return a, b
    ids_dev, mask_dev = t("h2d ids+mask (blocked)", h2d_pair)

    def h2d_nosync():
        return (jnp.asarray(ids_p, jnp.int32),
                jnp.asarray(mask_p, jnp.float32))
    t("h2d ids+mask (async)", h2d_nosync)

    sdp_dev, sttl_dev = engine._device_style(style, 1)
    dev_args = (ids_dev, mask_dev, sdp_dev, sttl_dev)

    spc_est = engine._spc_estimate(ids_p.shape[1])
    est = ids.shape[1] * spc_est * engine._spc_margin
    chunk = engine.cfg.chunk_size
    t_guess = buckets.latent_len_for_duration(est, engine.cfg.sample_rate, chunk)
    t_bucket = buckets.pick_bucket(t_guess, rt.latent_buckets)
    n_xfer = min(t_bucket, buckets.quantize_up(max(t_guess, 1), 16))
    print(f"t_bucket={t_bucket} n_xfer={n_xfer}")

    def dispatch():
        return engine._fused_fn(engine.params, *dev_args, engine._next_key(),
                                jnp.float32(1.05), 2, int(t_bucket),
                                engine.egress_format)
    wav_dev, dur_dev = t("fused dispatch (async)", dispatch)

    def dispatch_blocked():
        w, d = dispatch()
        d.block_until_ready()
        return w, d
    t("dispatch + block dur", dispatch_blocked)

    def slice_only():
        w = wav_dev[:, : n_xfer * chunk]
        w.block_until_ready()
        return w
    t("egress slice program", slice_only)

    wav_src = wav_dev[:, : n_xfer * chunk]
    t("device_get dur only", lambda: jax.device_get(dur_dev))
    t("device_get wav slice", lambda: jax.device_get(wav_src))
    t("device_get (wav,dur) tuple", lambda: jax.device_get((wav_src, dur_dev)))

    # full pattern as infer_batch_end does it, freshly dispatched each time
    def fresh_roundtrip():
        w, d = dispatch()
        try:
            d.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        ws = w[:, : n_xfer * chunk]
        return jax.device_get((ws, d))
    t("dispatch+slice+get (fresh)", fresh_roundtrip)

    def fresh_roundtrip_noslice():
        w, d = dispatch()
        return jax.device_get((w, d))
    t("dispatch+get FULL wav", fresh_roundtrip_noslice)


if __name__ == "__main__":
    main()
