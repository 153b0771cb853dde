"""Device mesh construction + sharding helpers.

The reference's parallel substrate is CPU process pools with pickle merges
(SURVEY.md §2c); here the substrate is a `jax.sharding.Mesh` with named
axes:

* ``data``  — shards the document/corpus axis (index shards) or the query
              batch axis (data parallelism), and the batch axis of dense-
              model training.
* ``model`` — shards dense-model tensors (tensor parallelism).

Collectives ride ICI: `psum` for index-build statistics reductions,
`all_gather` for per-shard top-k merges (SURVEY.md §5 "Distributed
communication backend").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdr.utils.config import MeshConfig


def make_mesh(
    data: int = 0,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    cfg: Optional[MeshConfig] = None,
) -> Mesh:
    """Build a (data, model) mesh.  data=0 → use all remaining devices."""
    if cfg is not None:
        data, model = cfg.data_parallel, cfg.model_parallel
    devices = list(devices if devices is not None else jax.devices())
    if data <= 0:
        data = len(devices) // max(model, 1)
    n = data * model
    if n > len(devices):
        raise ValueError(f"mesh {data}x{model} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0) -> NamedSharding:
    """Shard dimension ``axis`` of an ndim-array over the data mesh axis."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
