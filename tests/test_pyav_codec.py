"""Real-codec (PyAV) transcode round-trip through the Spark codec stages.

Mirrors the reference's audio codec gate
(/root/reference/tests/media/test_audio_codec.py:10-48): encode a known
multi-tone signal with a REAL lossy codec, decode it back, and require
the dominant-frequency structure to survive — spectral peak distance
< 35, the reference's threshold. Lossy codecs never round-trip
byte-exactly, so this, not equality, is the correctness gate.

Import-gated: ``av`` is not installed in this container, so these tests
skip cleanly here; the RawPcmCodec byte-exact round-trip in
test_media.py covers the stage plumbing either way. The spectral
helpers below are reimplemented from the reference's description
(tests/media/__init__.py:97-133), not copied: bin the rfft magnitude
spectrum to Hz resolution, smooth, threshold at a fraction of the max,
and compare sorted peak positions.
"""

from __future__ import annotations

import numpy as np
import pytest

from streamtasks_spark.media.codec import (
    PyAvAudioCodec,
    audio_decoder,
    audio_encoder,
    pyav_available,
)

pytestmark = pytest.mark.skipif(not pyav_available(), reason="PyAV not installed")

RATE = 32000
TONES_HZ = (440, 1320, 3200, 7040)


def _tone_signal(duration_s: float = 2.0) -> np.ndarray:
    t = np.arange(int(RATE * duration_s)) / RATE
    sig = sum(np.sin(2 * np.pi * f * t) for f in TONES_HZ)
    return (sig / len(TONES_HZ)).astype(np.float64)


def _spectrum_hz(samples: np.ndarray, rate: int) -> np.ndarray:
    """Magnitude spectrum re-binned to 1 Hz bins over [0, rate/2)."""
    mag = np.abs(np.fft.rfft(samples))
    bins = rate // 2
    edges = np.linspace(0, mag.size, bins + 1)
    out = np.add.reduceat(mag, edges[:-1].astype(int))
    return out / out.sum()


def _spectral_peaks(spec: np.ndarray) -> np.ndarray:
    kernel = np.ones(11) / 11.0
    s = spec.copy()
    for _ in range(5):
        s = np.convolve(s, kernel, mode="same")
    s[s < s.max() / 4] = 0
    local_max = (s[1:-1] > s[:-2]) & (s[1:-1] >= s[2:])
    return np.where(local_max)[0] + 1


def _peak_distance(a: np.ndarray, b: np.ndarray) -> int:
    """Reference's similarity metric (lower is better): sum of absolute
    distances between the two sorted peak lists, truncated to the
    shorter one."""
    pa, pb = np.sort(_spectral_peaks(a)), np.sort(_spectral_peaks(b))
    assert pa.size > 0 and pb.size > 0, "no spectral peaks found"
    n = min(pa.size, pb.size)
    return int(np.abs(pa[:n] - pb[:n]).sum())


def test_pyav_kernel_roundtrip_spectral():
    """Kernel-level gate, no Spark: aac encode → decode preserves the
    tone structure (reference test_inverse_transcoder)."""
    sig = _tone_signal()
    codec = PyAvAudioCodec(codec="aac", rate=RATE)
    out = np.asarray(codec.decode(codec.encode(sig.tolist())))
    assert out.size > 0
    sim = _peak_distance(
        _spectrum_hz(sig, RATE), _spectrum_hz(out, RATE)
    )
    assert sim < 35, f"spectral peak distance {sim} >= 35"


def test_pyav_spark_stage_roundtrip_spectral(spark):
    """The same gate through the distributed stages: chunk the signal
    into rows, audio_encoder → binary packets → audio_decoder, reorder
    by ts, compare spectra of the concatenation."""
    sig = _tone_signal()
    chunk = 4096
    rows = [
        (0, i, sig[i * chunk : (i + 1) * chunk].tolist())
        for i in range(sig.size // chunk)
    ]
    df = spark.createDataFrame(rows, "stream int, seq int, samples array<double>")
    df = df.withColumn("ts", df.seq.cast("timestamp"))
    codec = PyAvAudioCodec(codec="aac", rate=RATE)
    packets = audio_encoder(
        df, keys=["stream"], ts="ts", seq_col="seq", codec=codec
    )
    assert dict(packets.dtypes)["data"] == "binary"
    decoded = audio_decoder(
        packets, keys=["stream"], ts="ts", seq_col="seq", codec=codec
    )
    parts = decoded.orderBy("seq").select("samples").collect()
    out = np.concatenate([np.asarray(r.samples) for r in parts])
    sim = _peak_distance(
        _spectrum_hz(sig[: out.size], RATE), _spectrum_hz(out, RATE)
    )
    assert sim < 35, f"spectral peak distance {sim} >= 35"
