"""Worker for the real 2-process jax.distributed test (SURVEY.md §4
multihost-sim requirement; VERDICT r1 item 6).

Run as: python tests/_multiproc_worker.py <process_id> <num_processes> <port>

Each process gets 2 virtual CPU devices, joins the coordinator, builds its
HOST-LOCAL mesh (the per-host engine pattern of parallel/multihost.py), runs
a small engine batch on its host_shard slice of a request list, and prints
one machine-checkable line.
"""

import os
import sys


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    from supertonic_tpu.utils.jaxenv import force_cpu, setup_compilation_cache

    force_cpu()
    setup_compilation_cache()

    import jax

    from supertonic_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * nprocs  # global view across processes

    import numpy as np

    from supertonic_tpu.config import (
        AEConfig, DPConfig, DurationPredictorHParams, StyleTokenLayerConfig,
        TTLConfig, TTSConfig, TextEncoderHParams, VectorEstimatorHParams,
        VocoderHParams,
    )
    from supertonic_tpu.engine import SynthesisEngine
    from supertonic_tpu.engine.engine import VoiceStyle
    from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
    from supertonic_tpu.models import init_all

    style_cfg = StyleTokenLayerConfig(n_style=4, style_value_dim=16)
    cfg = TTSConfig(
        ae=AEConfig(sample_rate=16000, base_chunk_size=64),
        ttl=TTLConfig(chunk_compress_factor=2, latent_dim=8,
                      proj_out_idim=32, proj_out_odim=64, style=style_cfg),
        dp=DPConfig(latent_dim=8, chunk_compress_factor=2, style=style_cfg),
        text_encoder=TextEncoderHParams(vocab_size=256, dim=32, n_layers=2,
                                        n_heads=2),
        duration_predictor=DurationPredictorHParams(vocab_size=256, dim=32,
                                                    n_layers=2, n_heads=2),
        vector_estimator=VectorEstimatorHParams(dim=64, n_layers=2, n_heads=2,
                                                time_embed_dim=32),
        vocoder=VocoderHParams(dim=64, upsample_factors=(4, 4),
                               channels=(32, 16), resblock_dilations=(1, 3)),
    )
    params = init_all(0, cfg)

    # per-host engine over THIS host's 2 local devices (DP within the host)
    mesh = multihost.local_mesh()
    assert mesh.devices.size == 2
    engine = SynthesisEngine(params, cfg,
                             UnicodeProcessor(build_default_indexer()),
                             precision="f32", mesh=mesh)

    requests = [f"Distributed request number {i}." for i in range(8)]
    mine = multihost.host_shard(requests)
    assert len(mine) == len(requests) // nprocs
    rng = np.random.default_rng(0)
    b = len(mine)
    style = VoiceStyle(
        rng.standard_normal((b, 4, 16)).astype(np.float32),
        rng.standard_normal((b, 4, 16)).astype(np.float32),
    )
    wav, dur = engine.infer_batch(mine, ["en"] * b, style, total_step=2)
    assert wav.shape[0] == b and wav.ndim == 2
    assert np.all(dur > 0) and np.isfinite(wav).all()
    assert multihost.is_egress_host() == (pid == 0)

    print(f"MULTIPROC_OK pid={pid} nprocs={jax.process_count()} "
          f"global_devices={len(jax.devices())} shard={len(mine)} "
          f"wav={tuple(wav.shape)}", flush=True)


if __name__ == "__main__":
    main()
