"""Pod-slice serving example (BASELINE config 5).

Run one process per host across a v5e/v5p slice:

    TTS_COORD=<host0>:8476 NPROC=4 PID=$SLURM_PROCID python examples/example_pod.py

Architecture (see supertonic_tpu/parallel/multihost.py): the 66 M model is
replicated per host; each host's engine serves its shard of the request
stream over its local devices (data parallelism over utterances). No
cross-host collectives in the request path — DCN carries only control.
On a single machine this example degenerates to one host and still runs
(8 virtual CPU devices via JAX_PLATFORMS fallback or the local TPU).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo root

if os.getenv("TTS_PLATFORM") == "cpu":  # same env the CLI/server honor
    from supertonic_tpu.utils.jaxenv import force_cpu

    force_cpu()

from supertonic_tpu.utils.jaxenv import setup_compilation_cache

setup_compilation_cache()  # TPU compiles via the remote tunnel: cache them


import numpy as np

from supertonic_tpu import TTS
from supertonic_tpu.parallel.batcher import ContinuousBatcher
from supertonic_tpu.parallel.multihost import host_shard, initialize, local_mesh

initialize(
    coordinator_address=os.getenv("TTS_COORD"),
    num_processes=int(os.getenv("NPROC", "1")) if os.getenv("NPROC") else None,
    process_id=int(os.getenv("PID", "0")) if os.getenv("PID") else None,
)

import jax

print(f"process {jax.process_index()}/{jax.process_count()}, "
      f"{len(jax.local_devices())} local device(s)")

# engine over this host's local devices (data-parallel across them)
mesh = local_mesh() if len(jax.local_devices()) > 1 else None
tts = TTS()
if mesh is not None:
    from supertonic_tpu.engine import SynthesisEngine

    tts.engine = SynthesisEngine(
        tts.assets.params, tts.cfg, tts.assets.processor, mesh=mesh
    )

style = tts.get_voice_style("M1")

# a request stream, sharded across hosts
requests = [f"Request number {i} from the stream." for i in range(32)]
mine = host_shard(requests)
print(f"this host synthesizes {len(mine)} of {len(requests)} requests")

batcher = ContinuousBatcher(tts.engine, max_batch=16)
futures = [batcher.submit(t, "en", style, total_step=5) for t in mine]
total_audio = sum(f.result()[1] for f in futures)
batcher.shutdown()
print(f"done: {total_audio:.1f}s of audio, "
      f"{batcher.stats['batches']} batches for {len(mine)} requests")
