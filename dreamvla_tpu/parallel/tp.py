"""Tensor-parallel (Megatron-style) inference sharding over a (dp, tp) mesh.

The reference serves one model per GPU (`eval.sh` runs node_num x 8
single-GPU ranks); this module adds the missing scale-up axis for models or
batch sizes that outgrow one chip: shard every transformer matmul pair
column-then-row over 'tp' — fused-QKV / fc1 kernels split on the OUTPUT
axis, proj / fc2 kernels split on the INPUT axis — annotate with
NamedSharding, and let GSPMD insert the single all-reduce per block that
Megatron-LM does by hand (riding ICI). Works for the GPT-2 trunk, the ViT
encoder blocks, the resampler and the DiT head, because every one of them
names its projections with one of the recognised kernel names.

The whole-block fused Pallas kernels (ops.gpt2_fused / ops.vit_fused)
assume replicated weights; under a tp mesh keep
`cfg.fused_trunk_inference=False` (the XLA path partitions cleanly).

Typical use (eval farm, 2-way tp x 4-way env dp on one v5e-8):

    mesh = make_tp_mesh(n_dp=4, n_tp=2)
    params = shard_params_tp(params, mesh)
    policy = jax.jit(build_policy_core(model))   # GSPMD does the rest
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel (shard output axis): fused qkv + MLP in-projections
_COL_KERNELS = {"c_attn", "qkv", "fc1", "mlp_c_fc", "lin1", "attn_in_proj"}
# row-parallel (shard input axis): attention out-proj + MLP out-projections
_ROW_KERNELS = {"c_proj", "proj", "fc2", "mlp_c_proj", "lin2",
                "attn_out_proj", "out_proj"}


def make_tp_mesh(n_dp: int, n_tp: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices[: n_dp * n_tp].reshape(n_dp, n_tp), ("dp", "tp"))


def _param_spec(path, leaf, n_tp: int) -> P:
    names = [getattr(p, "key", None) for p in path]
    leafname = names[-1] if names else None
    owner = names[-2] if len(names) >= 2 else None
    if owner in _COL_KERNELS and leafname == "kernel" and leaf.ndim == 2 \
            and leaf.shape[1] % n_tp == 0:
        return P(None, "tp")
    if owner in _COL_KERNELS and leafname == "bias" and leaf.ndim == 1 \
            and leaf.shape[0] % n_tp == 0:
        return P("tp")
    if owner in _ROW_KERNELS and leafname == "kernel" and leaf.ndim == 2 \
            and leaf.shape[0] % n_tp == 0:
        return P("tp", None)
    # row-parallel biases (added after the reduce) stay replicated
    return P()


def param_shardings_tp(params: Any, mesh: Mesh):
    """NamedSharding tree for Megatron-style tp over `mesh`'s 'tp' axis."""
    n_tp = mesh.shape["tp"]
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [NamedSharding(mesh, _param_spec(path, leaf, n_tp))
             for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_params_tp(params: Any, mesh: Mesh):
    return jax.tree.map(jax.device_put, params, param_shardings_tp(params, mesh))


def shard_batch_dp(mesh: Mesh, batch: Any):
    """Replicate over tp, split the leading batch axis over dp (only for
    rank>=2 arrays whose batch dim divides; rng keys etc. stay replicated)."""
    n_dp = mesh.shape["dp"]

    def put(x):
        spec = (P("dp") if getattr(x, "ndim", 0) >= 2
                and x.shape[0] % n_dp == 0 else P())
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)
