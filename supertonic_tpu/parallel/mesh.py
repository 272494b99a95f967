"""Device mesh + sharding layout.

The reference is single-process / single-device (SURVEY.md §2.7); scale-out
is OUR design:

  * ``data`` axis — primary strategy: utterance batches sharded across the
    slice (the 66 M model fits one chip; BASELINE north star).
  * ``model`` axis — optional tensor parallelism over attention heads / FFN
    hidden, for latency-bound serving of long latents. GSPMD inserts the
    all-reduces over ICI from the weight shardings below.

No NCCL/MPI translation — collectives come from XLA via NamedSharding/pjit.
Multi-host entry is ``initialize_distributed`` (jax.distributed over DCN for
control; data-plane collectives ride ICI inside compiled programs).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(**kwargs) -> None:
    """Multi-host runtime init.

    Explicit coordinator config (kwargs or JAX_COORDINATOR_ADDRESS env) must
    succeed — a misconfigured coordinator silently degrading to
    single-process serving is a production incident, not a fallback
    (VERDICT r1 weak #7). Without any coordinator config this is a no-op.
    """
    import os

    configured = bool(kwargs) or bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not configured:
        return
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        from ..utils.logging import default_logger as log

        log.error("jax_distributed_init_failed", error=str(e))
        raise


def make_mesh(
    n_devices: int | None = None,
    *,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """2-D mesh (data, model). ``model_parallel=1`` = pure DP (default)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# parameter shardings (tensor parallelism)
# ---------------------------------------------------------------------------

def _pspec_for_path(path: tuple[str, ...]) -> P:
    """Megatron-style TP layout: column-parallel QKV/FFN-in, row-parallel
    O/FFN-out; everything else replicated."""
    if len(path) >= 3:
        parent, leaf = path[-3], path[-2]
        name = path[-1]
        # int8-quantized linears (models.quantize_params): "w_q" shards like
        # "w"; the per-output-channel "w_scale" shards like the bias.
        if parent == "ffn" and leaf == "in":
            return P(None, MODEL_AXIS) if name in ("w", "w_q") else P(MODEL_AXIS)
        if parent == "ffn" and leaf == "out":
            return P(MODEL_AXIS, None) if name in ("w", "w_q") else P()
        if parent in ("self", "cross") and leaf in ("q", "k", "v"):
            return P(None, MODEL_AXIS) if name in ("w", "w_q") else P(MODEL_AXIS)
        if parent in ("self", "cross") and leaf == "o":
            return P(MODEL_AXIS, None) if name in ("w", "w_q") else P()
    return P()


def _walk_pspecs(tree: Any, path: tuple[str, ...] = ()) -> Any:
    if isinstance(tree, dict):
        return {k: _walk_pspecs(v, path + (k,)) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_walk_pspecs(v, path + (str(i),)) for i, v in enumerate(tree)]
    return _pspec_for_path(path)


def param_pspecs(params: Any) -> Any:
    """PartitionSpec pytree matching ``params`` (TP layout on the model axis)."""
    return _walk_pspecs(params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put the param tree with TP shardings (replicated when the mesh
    has model=1)."""
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(np.asarray(x), NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )


# ---------------------------------------------------------------------------
# activation/input shardings (data parallelism over the batch dim)
# ---------------------------------------------------------------------------

def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, *arrays):
    """device_put arrays with the batch dim sharded over the data axis."""
    out = tuple(
        jax.device_put(a, batch_sharding(mesh, np.ndim(a))) for a in arrays
    )
    return out if len(out) > 1 else out[0]


def pad_batch_to_multiple(n: int, multiple: int) -> int:
    return int(math.ceil(n / multiple) * multiple)
