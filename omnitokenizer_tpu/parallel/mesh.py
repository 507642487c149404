"""Device mesh + sharding helpers.

Replaces the reference's NCCL/DDP plumbing
(/root/reference/ddp_utils.py:333-365, DistributedSampler wiring in
data.py:521-535) with single-controller GSPMD: one `Mesh(('data',))`, batch
sharded over `data`, parameters replicated, gradients/codebook stats reduced
by XLA-inserted collectives over ICI.  No rank discovery, no process groups —
`jax.distributed.initialize()` + mesh covers multi-host.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(devices: Optional[Sequence[Any]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(batch, mesh: Mesh):
    """Shard leading (batch) axis of every leaf over the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec() -> P:
    return P(DATA_AXIS)


def replicated_spec() -> P:
    return P()
