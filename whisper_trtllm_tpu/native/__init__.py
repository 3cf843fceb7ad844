from whisper_trtllm_tpu.native.lib import (  # noqa: F401
    NativeSlotManager,
    build_native,
    load_library,
    load_wav_16k,
    native_available,
)
