from whisper_trtllm_tpu.parallel.mesh import make_mesh  # noqa: F401
from whisper_trtllm_tpu.parallel.partition import (  # noqa: F401
    param_partition_specs,
    shard_params,
)
