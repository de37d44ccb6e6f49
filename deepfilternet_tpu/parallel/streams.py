"""Multi-device stream sharding for batched inference.

Thousands of independent audio streams shard over the `data` axis of a
device mesh: each chip runs its own slice of the stream batch through the
scanned streaming cell with zero cross-chip traffic on the hot path (the
model weights are replicated). This is the TPU-native scale-out story for
the aggregate-RTF north star — multiply per-chip throughput by the mesh
size over ICI, and by hosts over DCN.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepfilternet_tpu.parallel.mesh import data_parallel_mesh
from deepfilternet_tpu.streaming import RuntimeParams, StreamCarry, StreamingRuntime


class ShardedStreamingRuntime(StreamingRuntime):
    """StreamingRuntime with carry + audio sharded over a mesh axis.

    Stream count must be divisible by the mesh size. Weights (closed over in
    the jitted scan) are replicated by XLA.
    """

    def __init__(self, model, df_state, mesh: Optional[Mesh] = None,
                 params: RuntimeParams = RuntimeParams(), axis: str = "data",
                 dtype=jnp.float32, fuse_ops: bool = False):
        super().__init__(model, df_state, params, dtype=dtype,
                         fuse_ops=fuse_ops)
        self.mesh = mesh or data_parallel_mesh(axis=axis)
        self.axis = axis
        self._shard = NamedSharding(self.mesh, P(axis))

    def _place(self, tree, n_streams: int):
        """Shard each leaf along its stream dimension (dim 0 for most state,
        dim 1 for [L, S, H] GRU hiddens); replicate anything else."""

        def put(x):
            if x.ndim >= 1 and x.shape[0] == n_streams:
                spec = P(self.axis)
            elif x.ndim >= 2 and x.shape[1] == n_streams:
                spec = P(None, self.axis)
            else:
                spec = P()
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return jax.tree.map(put, tree)

    def init(self, n_streams: int) -> StreamCarry:
        n_dev = self.mesh.devices.size
        assert n_streams % n_dev == 0, (
            f"n_streams={n_streams} must divide over {n_dev} devices"
        )
        return self._place(super().init(n_streams), n_streams)

    def process(self, carry: StreamCarry, audio: jnp.ndarray
                ) -> Tuple[StreamCarry, jnp.ndarray]:
        audio = jax.device_put(jnp.asarray(audio), self._shard)
        return super().process(carry, audio)
