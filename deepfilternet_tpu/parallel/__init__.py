from deepfilternet_tpu.parallel.mesh import (  # noqa: F401
    data_parallel_mesh,
    shard_batch,
    shard_params,
)
