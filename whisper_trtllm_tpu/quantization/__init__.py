from whisper_trtllm_tpu.quantization.mode import QuantMode  # noqa: F401
from whisper_trtllm_tpu.quantization.quantize import (  # noqa: F401
    dequantize_kernel,
    fp8_qdq_activation,
    fp8_quantize,
    quantize_dense_params,
    quantize_dense_params_fp8,
    quantize_kernel,
    quantize_kernel_fp8,
    quantize_kernel_int4,
    unpack_int4_kernel,
    weight_only_quantize,
    weight_only_quantize_int4,
)
from whisper_trtllm_tpu.quantization.smooth import (  # noqa: F401
    gpt_act_stats,
    smooth_quantize_gpt,
    smooth_quantize_whisper,
    whisper_act_stats,
)
from whisper_trtllm_tpu.quantization.quantize import (  # noqa: F401
    quantize_embedding,
    quantize_vocab_embedding,
)
