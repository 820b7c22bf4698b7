from audio_generation_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_params,
)
from audio_generation_tpu.parallel.context import context_parallel_encode  # noqa: F401
