"""Inference operators (reference inference/ tasks: ASR speech
recognition, TTS, llama.cpp chat, speech enhancement ×2 — SURVEY §2.8).

The production pattern for ML inference on Spark, used by every stage
here:

1. load the model ONCE per executor process (module-level lazy handle
   inside the Arrow worker, not per batch);
2. ``mapInPandas`` over Arrow batches — the model sees columnar batches,
   never python rows;
3. stream-partition discipline for stateful models (chat history):
   repartition by conversation key so one worker owns a conversation.

The model kernels themselves are STUBBED (speechbrain/fastspeech2/
llama.cpp are not in this container): each stub is deterministic so the
plumbing is testable end-to-end, and each documents the one-line
drop-in for the real model. This mirrors how the reference splits task
plumbing from the model call (e.g. asrspeechrecognition.py).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-executor model cache (pattern: real handles would live here)
_MODEL_CACHE: dict[str, object] = {}


def _get_model(name: str):
    """Lazy per-executor model handle. Real models: replace the stub
    constructor with e.g. speechbrain.pretrained.EncoderDecoderASR."""
    if name not in _MODEL_CACHE:
        _MODEL_CACHE[name] = object()
    return _MODEL_CACHE[name]


def asr_stub(
    chunks: DataFrame,
    *,
    id_cols: Sequence[str] = ("user_id", "ts"),
    samples_col: str = "samples",
) -> DataFrame:
    """ASR stage (reference inference/asrspeechrecognition.py): audio
    chunks → text. Stub kernel: deterministic token count from sample
    energy (real model: one line in ``transcribe``)."""
    ids = list(id_cols)
    src = chunks.select(*ids, samples_col)
    ddl = ", ".join(f"`{c}` {src.schema[c].dataType.simpleString()}" for c in ids)

    def transcribe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _get_model("asr")
        for pdf in batches:
            out = pdf[ids].copy()
            out["text"] = [
                f"tok{int(abs(sum(s)) * 10) % 97}" for s in pdf[samples_col]
            ]
            yield out

    return src.mapInPandas(transcribe, f"{ddl}, text string")


def tts_stub(
    texts: DataFrame,
    *,
    id_cols: Sequence[str] = ("user_id", "ts"),
    text_col: str = "value",
    n_samples: int = 16,
) -> DataFrame:
    """TTS stage (reference inference/fastspeech2tts.py): text → audio
    chunk. Stub: deterministic waveform from character codes."""
    ids = list(id_cols)
    src = texts.select(*ids, text_col)
    ddl = ", ".join(f"`{c}` {src.schema[c].dataType.simpleString()}" for c in ids)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _get_model("tts")
        idx = np.arange(n_samples)
        for pdf in batches:
            out = pdf[ids].copy()
            samples = []
            for t in pdf[text_col].astype(str):
                if not t:
                    samples.append([0.0] * n_samples)
                    continue
                # code points as a vector (utf-32-le units == ord()),
                # waveform = (cp % 16) - 8 cycled to n_samples
                codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                samples.append(
                    ((codes[idx % codes.size] % 16).astype(np.float64) - 8.0).tolist()
                )
            out["samples"] = samples
            yield out

    return src.mapInPandas(synth, f"{ddl}, samples array<double>")


def speech_enhance_stub(
    chunks: DataFrame,
    *,
    id_cols: Sequence[str] = ("user_id", "ts"),
    samples_col: str = "samples",
) -> DataFrame:
    """Speech-enhancement stage (reference inference/
    smespeechenhancement.py, waveformspeechenhancement.py: audio chunk in,
    enhanced chunk out). Stub kernel: 3-tap moving average (edge samples
    average their available neighbors) — a real, deterministic DSP
    smoother so the Arrow plumbing is verifiable end-to-end; the
    speechbrain enhancer drops into ``enhance`` unchanged."""
    ids = list(id_cols)
    src = chunks.select(*ids, samples_col)
    ddl = ", ".join(f"`{c}` {src.schema[c].dataType.simpleString()}" for c in ids)

    def enhance(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _get_model("enhance")
        for pdf in batches:
            out = pdf[ids].copy()
            enhanced = []
            for s in pdf[samples_col]:
                # vectorized 3-tap smoother; (a+b)+c grouping matches the
                # scalar formulation bit-for-bit (numpy elementwise + is
                # IEEE add in the same order)
                a = np.asarray(s, dtype=np.float64)
                n = a.size
                if n <= 1:
                    enhanced.append(a.tolist())
                    continue
                e = np.empty(n, dtype=np.float64)
                e[0] = (a[0] + a[1]) / 2.0
                e[-1] = (a[-2] + a[-1]) / 2.0
                if n > 2:
                    e[1:-1] = ((a[:-2] + a[1:-1]) + a[2:]) / 3.0
                enhanced.append(e.tolist())
            out["enhanced"] = enhanced
            yield out

    return src.mapInPandas(enhance, f"{ddl}, enhanced array<double>")


def llm_chat_stub(
    messages: DataFrame,
    *,
    conversation_col: str = "user_id",
    ts: str = "ts",
    text_col: str = "value",
    seq_col: str | None = None,
    history_limit: int = 8,
) -> DataFrame:
    """Chat stage (reference inference/llamacppchat.py:51-57 — the model
    is STATEFUL per conversation: history is carried). Batch
    formulation: conversations co-partitioned, rows processed in event
    order, reply = f(history, prompt). Stub reply: running count of
    turns + echo length; real llama.cpp drops into ``reply_fn``."""
    order = [F.col(ts).asc()] + ([F.col(seq_col).asc()] if seq_col else [])
    src = (
        messages.select(conversation_col, ts, *( [seq_col] if seq_col else []), text_col)
        .repartition(F.col(conversation_col))
        .sortWithinPartitions(F.col(conversation_col), *order)
    )
    ids = [conversation_col, ts] + ([seq_col] if seq_col else [])
    ddl = ", ".join(f"`{c}` {src.schema[c].dataType.simpleString()}" for c in ids)

    def chat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _get_model("llm")
        histories: dict[object, list[str]] = {}
        for pdf in batches:
            replies = []
            for conv, text in zip(pdf[conversation_col], pdf[text_col].astype(str)):
                hist = histories.setdefault(conv, [])
                hist.append(text)
                # not hist[:-limit]: a -0 slice would delete nothing at limit=0
                del hist[: max(0, len(hist) - history_limit)]
                replies.append(f"reply#{len(hist)}:{sum(len(h) for h in hist)}")
            out = pdf[ids].copy()
            out["reply"] = replies
            yield out

    return src.mapInPandas(chat, f"{ddl}, reply string")
