from whisper_trtllm_tpu.parallel.mesh import make_mesh  # noqa: F401
from whisper_trtllm_tpu.parallel.partition import (  # noqa: F401
    gpt_partition_specs,
    llama_partition_specs,
    param_partition_specs,
    shard_params,
    shard_zoo_params,
)
