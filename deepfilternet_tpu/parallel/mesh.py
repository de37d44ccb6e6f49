"""Device-mesh utilities: the framework's parallelism layer.

The reference has no multi-device parallelism (SURVEY.md §2.7) — its
"distribution" is a rayon CPU worker pool. The TPU-native counterpart is a
`jax.sharding.Mesh` with named axes:

  * training: batch sharded over the `data` axis; parameters replicated;
    XLA inserts the gradient psum over ICI (classic DP via pjit).
  * inference/datagen: thousands of independent streams sharded over
    `data` — no cross-chip traffic on the hot path.

The model is small (~2M params), so tensor/pipeline sharding of weights is
counterproductive; scaling is throughput-oriented over batch/streams, which
is exactly what the mesh expresses. Multi-host extends the same mesh over
DCN with batch sharded across hosts.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data") -> Dict[str, Any]:
    """Place a host batch dict on the mesh, sharded along dim 0."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Replicate parameters across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), params)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
