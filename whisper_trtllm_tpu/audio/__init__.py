from whisper_trtllm_tpu.audio.features import (  # noqa: F401
    LogMelSpectrogram,
    log_mel_spectrogram,
    pad_or_trim,
    N_SAMPLES,
    HOP_LENGTH,
    N_FFT,
    SAMPLE_RATE,
)
from whisper_trtllm_tpu.audio.mel import mel_filter_bank  # noqa: F401
