"""Real-model inference kernels behind the Arrow stages, import-gated.

The reference runs actual models (speechbrain ASR/enhancement,
llama.cpp chat — /root/reference/streamtasks/system/tasks/inference/);
this container has none of them, so these tests skip cleanly here and
run for real wherever the libraries exist. The deterministic stubs stay
the default path (covered by test_media.py and the driver oracle);
these pin that the SAME mapInPandas stages accept the real kernels.
"""

from __future__ import annotations

import numpy as np
import pytest

from streamtasks_spark.media.inference import (
    LlamaCppChat,
    SpeechBrainASR,
    SpeechBrainEnhancer,
    asr_stub,
    llama_cpp_available,
    llm_chat_stub,
    speech_enhance_stub,
    speechbrain_available,
)

needs_sb = pytest.mark.skipif(
    not speechbrain_available(), reason="speechbrain not installed"
)
needs_llama = pytest.mark.skipif(
    not llama_cpp_available(), reason="llama-cpp-python not installed"
)


def _tone_chunks(spark, n_rows=4, n=16000):
    t = np.arange(n) / 16000.0
    wave = (0.1 * np.sin(2 * np.pi * 440 * t)).tolist()
    rows = [(i, float(i), wave) for i in range(n_rows)]
    return spark.createDataFrame(
        rows, "user_id int, ts double, samples array<double>"
    )


def test_kernels_raise_without_libraries():
    """The import gates must fail LOUDLY at construction, not at
    executor time."""
    if not speechbrain_available():
        with pytest.raises(ImportError):
            SpeechBrainASR()
        with pytest.raises(ImportError):
            SpeechBrainEnhancer()
    if not llama_cpp_available():
        with pytest.raises(ImportError):
            LlamaCppChat("/nonexistent/model.gguf")


@needs_sb
def test_real_asr_through_arrow_stage(spark):
    out = asr_stub(
        _tone_chunks(spark), id_cols=("user_id", "ts"), kernel=SpeechBrainASR()
    ).collect()
    assert len(out) == 4
    assert all(isinstance(r["text"], str) for r in out)


@needs_sb
def test_real_enhancer_through_arrow_stage(spark):
    out = speech_enhance_stub(
        _tone_chunks(spark), id_cols=("user_id", "ts"),
        kernel=SpeechBrainEnhancer(),
    ).collect()
    assert len(out) == 4
    assert all(len(r["enhanced"]) > 0 for r in out)


@needs_llama
def test_real_chat_through_arrow_stage(spark, tmp_path):
    import os

    model_path = os.environ.get("LLAMA_MODEL_PATH")
    if not model_path or not os.path.exists(model_path):
        pytest.skip("LLAMA_MODEL_PATH not set")
    rows = [(1, float(i), f"message {i}") for i in range(3)]
    df = spark.createDataFrame(rows, "user_id int, ts double, value string")
    out = llm_chat_stub(df, reply_fn=LlamaCppChat(model_path)).collect()
    assert len(out) == 3
    assert all(r["reply"] for r in out)
