from whisper_trtllm_tpu.training.train import (  # noqa: F401
    cross_entropy_loss,
    guided_attn_weights,
    make_train_step,
)
