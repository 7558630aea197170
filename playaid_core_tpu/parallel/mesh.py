"""Device mesh construction and sharding rules.

The reference had no multi-device story at all (Lightning
``Trainer(devices=1)``, shell-level process fan-out — reference:
action_detector.py:67-74, multi_manuscript.sh:1-7).  Here parallelism is
first-class and ICI-native:

* a 2-D ``(data, model)`` mesh over all chips;
* batch sharded over ``data`` (pure DP for throughput);
* tensor-parallel rules that shard the ResFormer's transformer FFN and
  attention heads plus the wide classifier/temporal denses over ``model``
  — XLA inserts the all-reduces over ICI;
* everything expressed as NamedSharding, so the same code runs on one
  chip (trivial mesh) or a full slice.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Build a (data, model) mesh.  Defaults to all devices data-parallel."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (data_parallel, model_parallel, n)
    dev_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over `data`, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter tensor-parallel rules: (path regex, PartitionSpec).  Applied to
# "/"-joined flax param paths; first match wins; default replicated.
# Kernels are [in, out]; sharding the out dim of the up-projection and the
# in dim of the down-projection keeps activations sharded across the FFN
# with a single psum at the end (Megatron-style).
DEFAULT_TP_RULES = (
    (r".*ffn_in/kernel$", P(None, "model")),
    (r".*ffn_in/bias$", P("model")),
    (r".*ffn_out/kernel$", P("model", None)),
    # Attention shards over the HEADS axis (Megatron-style): each chip owns
    # whole heads, so QK^T and attn@V need no collectives; only the output
    # projection's contraction over heads ends in one psum.
    # qkv kernels are [embed, heads, head_dim]; out is [heads, head_dim, embed].
    (r".*self_attn/(query|key|value)/kernel$", P(None, "model", None)),
    (r".*self_attn/(query|key|value)/bias$", P("model", None)),
    (r".*self_attn/out/kernel$", P("model", None, None)),
    (r".*temporal_dense/kernel$", P(None, "model")),
    (r".*temporal_dense/bias$", P("model")),
    (r".*lstm_\d+/[ih][fiog]?/.*kernel$", P(None, "model")),
    (r".*classifier/kernel$", P(None, "model")),
    (r".*classifier/bias$", P("model")),
)


def param_specs(params, mesh: Optional[Mesh] = None, rules=DEFAULT_TP_RULES):
    """Map a param pytree to PartitionSpecs by path rules.  When ``mesh``
    is given, rules whose sharded dims don't divide evenly fall back to
    replication."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh else {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        return "/".join(parts)

    spec_map = {}
    for path, leaf in flat:
        ps = path_str(path)
        spec = P()
        for pattern, candidate in rules:
            if re.match(pattern, ps):
                # Only shard when the dims divide; fall back to replication.
                ok = len(candidate) <= leaf.ndim
                for dim, axis in enumerate(candidate):
                    if axis is None or not ok:
                        continue
                    if leaf.shape[dim] % axis_sizes.get(axis, 1) != 0:
                        ok = False
                if ok:
                    spec = candidate
                break
        spec_map[ps] = spec

    def to_spec(path, leaf):
        return spec_map[path_str(path)]

    return jax.tree_util.tree_map_with_path(to_spec, params)


def param_shardings(mesh: Mesh, params, rules=DEFAULT_TP_RULES):
    specs = param_specs(params, mesh, rules)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


def shard_params(mesh: Mesh, params, rules=DEFAULT_TP_RULES):
    """Place a param pytree onto the mesh according to the TP rules."""
    shardings = param_shardings(mesh, params, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
