"""Device mesh + parameter sharding rules for Whisper pytrees.

The reference has no distributed story (single process, k8s replicas;
SURVEY.md §2.4) — this module is the TPU-native replacement for
``pool_size`` replication: a 2-D ``(data, model)`` mesh where the data axis
carries batch parallelism (many streams per replica) and the model axis
tensor-parallel-shards attention heads and MLP hidden width for models too
big for one chip (whisper-large-v3). XLA GSPMD inserts the collectives; we
only annotate.

Sharding rules (Megatron-style column/row split so each block needs exactly
one reduce per attention and one per MLP):
- attn/xattn q,k,v weights (L, d, d): split output dim  -> P(None, None, M)
- attn/xattn o weights    (L, d, d): split input dim    -> P(None, M, None)
- mlp fc1 (L, d, 4d): split hidden                       -> P(None, None, M)
- mlp fc2 (L, 4d, d): split hidden                       -> P(None, M, None)
- biases on split dims follow; everything else (conv stem, embeddings,
  layer norms, positional tables) is replicated.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(
    shape: Optional[Tuple[int, int]] = None,
    *,
    devices: Optional[Sequence[Any]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Create a 2-D device mesh. ``shape=None`` puts every device on the
    data axis (pure replication — the common serving layout for models that
    fit on one chip)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(
            f"mesh shape {shape} does not match device count {n}"
        )
    grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, axis_names)


def _spec_for_path(path: Tuple[Any, ...], leaf: Any) -> P:
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    ndim = np.ndim(leaf) if not hasattr(leaf, "ndim") else leaf.ndim

    def stacked(*axes):
        """Prepend a replicated leading layer axis when the leaf lives in a
        stacked ``blocks`` pytree."""
        if "blocks" in keys:
            return P(None, *axes)
        return P(*axes)

    if "attn" in keys or "xattn" in keys:
        if "o" in keys:
            if keys[-1] == "w":
                return stacked(MODEL_AXIS, None)
            return stacked(None)  # o bias replicated (post-reduce)
        # q/k/v
        if keys[-1] == "w":
            return stacked(None, MODEL_AXIS)
        return stacked(MODEL_AXIS)
    if "mlp" in keys:
        if "fc1" in keys:
            if keys[-1] == "w":
                return stacked(None, MODEL_AXIS)
            return stacked(MODEL_AXIS)
        if "fc2" in keys:
            if keys[-1] == "w":
                return stacked(MODEL_AXIS, None)
            return stacked(None)
    # conv stem, embeddings, positional tables, layer norms: replicated
    return P(*([None] * 0)) if ndim == 0 else P()


def whisper_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a Whisper params pytree."""
    return jax.tree_util.tree_map_with_path(_spec_for_path, params)


def named_shardings(
    mesh: Mesh, specs: Dict[str, Any]
) -> Dict[str, Any]:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a params pytree onto the mesh under the TP rules."""
    shardings = named_shardings(mesh, whisper_param_specs(params))
    return jax.device_put(params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis (replicated over model)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "build_mesh",
    "named_shardings",
    "replicated",
    "shard_params",
    "whisper_param_specs",
]
