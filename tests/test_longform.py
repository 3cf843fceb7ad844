"""Long-form chunked streaming tests."""

import numpy as np

from whisper_trtllm_tpu.runtime.longform import chunk_audio


def test_chunking_exact():
    audio = np.ones(480000 * 2 + 1000, np.float32)
    chunks = chunk_audio(audio)
    assert chunks.shape == (3, 480000)
    assert chunks[0].sum() == 480000
    assert chunks[2][:1000].sum() == 1000 and chunks[2][1000:].sum() == 0


def test_chunking_short():
    chunks = chunk_audio(np.ones(100, np.float32))
    assert chunks.shape == (1, 480000)


def test_chunking_overlap():
    audio = np.arange(480000 + 240000, dtype=np.float32)
    chunks = chunk_audio(audio, overlap_seconds=15.0)
    # stride = 15 s → starts at 0, 240000, 480000
    assert chunks.shape[0] == 3
    assert chunks[1][0] == 240000.0
