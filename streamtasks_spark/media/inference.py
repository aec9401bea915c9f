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
_MODEL_CACHE: dict[object, object] = {}


def _get_model(name: object, loader=None):
    """Lazy per-executor model handle, keyed by model identity. With a
    ``loader`` callable the cache holds the REAL model (loaded once per
    executor process, reused across Arrow batches); without one it holds
    a placeholder so the stub path exercises the same cache discipline."""
    if name not in _MODEL_CACHE:
        _MODEL_CACHE[name] = loader() if loader is not None else object()
    return _MODEL_CACHE[name]


def speechbrain_available() -> bool:
    try:  # pragma: no cover - not installed in this container
        import speechbrain  # noqa: F401

        return True
    except ImportError:
        return False


def llama_cpp_available() -> bool:
    try:  # pragma: no cover - not installed in this container
        import llama_cpp  # noqa: F401

        return True
    except ImportError:
        return False


class SpeechBrainASR:
    """Real ASR kernel (reference inference/asrspeechrecognition.py:
    the task wraps speechbrain's EncoderDecoderASR and feeds it audio
    chunks). Drop into :func:`asr_stub` via ``kernel=``; the model
    loads once per executor through ``_MODEL_CACHE`` — the kernel
    object itself carries only strings, so it pickles to workers
    cheaply. Constructing raises ImportError when speechbrain is
    absent (import-gated, stubs stay the default)."""

    def __init__(
        self,
        source: str = "speechbrain/asr-crdnn-rnnlm-librispeech",
        rate: int = 16000,
    ):
        if not speechbrain_available():
            raise ImportError("speechbrain is not installed")
        self.source = source
        self.rate = rate

    def __call__(self, sample_arrays) -> list[str]:
        import torch  # speechbrain depends on torch

        def load():
            from speechbrain.inference.ASR import EncoderDecoderASR

            return EncoderDecoderASR.from_hparams(source=self.source)

        model = _get_model(("sb_asr", self.source), load)
        waves = [np.asarray(s, dtype=np.float32) for s in sample_arrays]
        n = max((w.size for w in waves), default=0)
        batch = torch.zeros(len(waves), n)
        lens = torch.zeros(len(waves))
        for i, w in enumerate(waves):
            batch[i, : w.size] = torch.from_numpy(w)
            lens[i] = w.size / max(n, 1)
        texts, _ = model.transcribe_batch(batch, lens)
        return [str(t) for t in texts]


class SpeechBrainEnhancer:
    """Real speech-enhancement kernel (reference inference/
    smespeechenhancement.py wraps speechbrain SpectralMaskEnhancement).
    Drop into :func:`speech_enhance_stub` via ``kernel=``."""

    def __init__(self, source: str = "speechbrain/metricgan-plus-voicebank"):
        if not speechbrain_available():
            raise ImportError("speechbrain is not installed")
        self.source = source

    def __call__(self, sample_arrays) -> list[list[float]]:
        import torch

        def load():
            from speechbrain.inference.enhancement import SpectralMaskEnhancement

            return SpectralMaskEnhancement.from_hparams(source=self.source)

        model = _get_model(("sb_enh", self.source), load)
        out = []
        for s in sample_arrays:
            wave = torch.from_numpy(np.asarray(s, dtype=np.float32)).unsqueeze(0)
            enhanced = model.enhance_batch(wave, lengths=torch.tensor([1.0]))
            out.append(enhanced.squeeze(0).numpy().astype(np.float64).tolist())
        return out


class LlamaCppChat:
    """Real chat kernel (reference inference/llamacppchat.py:51-57 —
    llama.cpp completion over the carried conversation history). Drop
    into :func:`llm_chat_stub` via ``reply_fn=``. The Llama handle
    loads once per executor; the kernel pickles as just the path +
    params."""

    def __init__(self, model_path: str, n_ctx: int = 2048, max_tokens: int = 64):
        if not llama_cpp_available():
            raise ImportError("llama-cpp-python is not installed")
        self.model_path = model_path
        self.n_ctx = n_ctx
        self.max_tokens = max_tokens

    def __call__(self, history: list[str], prompt: str) -> str:
        def load():
            from llama_cpp import Llama

            return Llama(model_path=self.model_path, n_ctx=self.n_ctx)

        model = _get_model(("llama", self.model_path), load)
        msgs = [
            {"role": ("user" if i % 2 == 0 else "assistant"), "content": h}
            for i, h in enumerate(history)
        ] + [{"role": "user", "content": prompt}]
        res = model.create_chat_completion(msgs, max_tokens=self.max_tokens)
        return str(res["choices"][0]["message"]["content"])


def asr_stub(
    chunks: DataFrame,
    *,
    id_cols: Sequence[str] = ("user_id", "ts"),
    samples_col: str = "samples",
    kernel=None,
) -> DataFrame:
    """ASR stage (reference inference/asrspeechrecognition.py): audio
    chunks → text. Default kernel is a deterministic stub (token count
    from sample energy); pass ``kernel=SpeechBrainASR()`` for the real
    model — same Arrow stage, same schema."""
    ids = list(id_cols)
    src = chunks.select(*ids, samples_col)
    ddl = ", ".join(f"`{c}` {src.schema[c].dataType.simpleString()}" for c in ids)

    def transcribe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _get_model("asr")
        for pdf in batches:
            out = pdf[ids].copy()
            if kernel is not None:
                out["text"] = kernel(list(pdf[samples_col]))
            else:
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
            # NULL text synthesizes silence, same as empty — astype(str)
            # would turn None into the literal "None" and voice it
            for t in pdf[text_col].fillna(""):
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
    kernel=None,
) -> DataFrame:
    """Speech-enhancement stage (reference inference/
    smespeechenhancement.py, waveformspeechenhancement.py: audio chunk in,
    enhanced chunk out). Stub kernel: 3-tap moving average (edge samples
    average their available neighbors) — a real, deterministic DSP
    smoother so the Arrow plumbing is verifiable end-to-end; pass
    ``kernel=SpeechBrainEnhancer()`` for the real model."""
    ids = list(id_cols)
    src = chunks.select(*ids, samples_col)
    ddl = ", ".join(f"`{c}` {src.schema[c].dataType.simpleString()}" for c in ids)

    def enhance(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _get_model("enhance")
        for pdf in batches:
            out = pdf[ids].copy()
            if kernel is not None:
                out["enhanced"] = kernel(list(pdf[samples_col]))
                yield out
                continue
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
    reply_fn=None,
) -> DataFrame:
    """Chat stage (reference inference/llamacppchat.py:51-57 — the model
    is STATEFUL per conversation: history is carried). Batch
    formulation: conversations co-partitioned, rows processed in event
    order, reply = f(history, prompt). Stub reply: running count of
    turns + echo length; pass ``reply_fn=LlamaCppChat(path)`` for real
    llama.cpp completions (signature: reply_fn(history, prompt) → str,
    where history excludes the current prompt)."""
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
                if reply_fn is not None:
                    reply = reply_fn(list(hist), text)
                hist.append(text)
                # not hist[:-limit]: a -0 slice would delete nothing at limit=0
                del hist[: max(0, len(hist) - history_limit)]
                if reply_fn is None:
                    reply = f"reply#{len(hist)}:{sum(len(h) for h in hist)}"
                replies.append(reply)
            out = pdf[ids].copy()
            out["reply"] = replies
            yield out

    return src.mapInPandas(chat, f"{ddl}, reply string")
