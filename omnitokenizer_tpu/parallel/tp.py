"""Tensor-parallel (Megatron-layout) + sequence-parallel shardings.

The reference's only parallelism is data-parallel DDP (SURVEY §2.8;
/root/reference/ddp_utils.py:333-365).  On TPU the natural extra axes are
free to add because sharding is declarative GSPMD — no NCCL plumbing:

* **TP** for the GPT synthesis stack (n_embd 1536 × 24 layers): Megatron
  layout — column-parallel q/k/v and fc (shard the output feature dim),
  row-parallel proj and proj_out (shard the input feature dim; XLA inserts
  the all-reduce on their outputs), vocab-sharded LM head.  Attention heads
  (16) must be divisible by the model-axis size so head boundaries align
  with shards.
* **SP** for the tokenizer: shard spatial rows of the pixel input over the
  model axis — XLA inserts the gather/reduce collectives the intra-frame
  spatial attention needs.

Everything here is PartitionSpec trees + meshes; the model code is
unchanged.  XLA emits the collectives over ICI.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Dense kernels whose OUTPUT feature dim is sharded (column-parallel).
_COL_PARALLEL = re.compile(r"(query|key|value|fc)$")
# Dense kernels whose INPUT feature dim is sharded (row-parallel).
_ROW_PARALLEL = re.compile(r"(proj|proj_out)$")


def tp_mesh(n_model: int, devices: Optional[Sequence[Any]] = None) -> Mesh:
    """2D ('data', 'model') mesh; model axis innermost so TP collectives ride
    the fastest ICI links."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    assert n % n_model == 0, f"{n} devices not divisible by model={n_model}"
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def gpt_param_specs(params) -> Any:
    """PartitionSpec tree for a GPT param tree (models/gpt.py).

    Megatron layout over MODEL_AXIS; everything else replicated.  Biases of
    column-parallel layers are sharded with their outputs; row-parallel
    biases stay replicated (added after the implicit all-reduce).
    """

    def spec(path, leaf) -> P:
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        parent = names[-2] if len(names) >= 2 else ""
        leaf_name = names[-1]
        if _COL_PARALLEL.search(parent):
            return P(None, MODEL_AXIS) if leaf_name == "kernel" else P(MODEL_AXIS)
        if _ROW_PARALLEL.search(parent):
            return P(MODEL_AXIS, None) if leaf_name == "kernel" else P()
        if parent == "head" and leaf_name == "kernel":  # (C, V): vocab-sharded
            return P(None, MODEL_AXIS)
        if parent == "tok_emb" and leaf_name == "embedding":  # (V, C)
            return P(None, MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh, specs=None):
    """Place a param tree on `mesh` according to `specs` (default: GPT TP).

    Specs whose sharded dims don't divide the axis size fall back to
    replicated — e.g. the vocab-sharded LM head with the canonical odd
    vocab 9193 (8192 codes + 1000 classes + 1 sos)."""
    specs = gpt_param_specs(params) if specs is None else specs

    def place(x, s):
        for dim, name in enumerate(s):
            if name is not None and x.shape[dim] % mesh.shape[name] != 0:
                s = P()
                break
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(place, params, specs)


def sharded_opt_init(opt, params_sharded):
    """Optimizer init whose state inherits the params' shardings.

    optax states embed the param tree verbatim (mu/nu = zeros_like(params))
    and eager zeros_like preserves NamedShardings, so a plain eager init is
    already correctly placed — no spec tree needed.  (A jitted init would
    NOT work: zeros_like has no data dependence on the input, so the
    compiler is free to lay the outputs out unsharded.)"""
    return opt.init(params_sharded)


def sp_pixel_spec() -> P:
    """Sequence-parallel input spec for (B, T, H, W, C) pixels: batch over
    data, spatial rows over model.  Downstream, XLA turns the intra-frame
    attention into gather/reduce collectives over the model axis."""
    return P(DATA_AXIS, None, MODEL_AXIS)
