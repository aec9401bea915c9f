"""Media tier: codec and container plumbing (SURVEY §2.1, §2.8).

The reference's codec/container operators are PyAV-backed; this
container has no media libraries, so the KERNELS are pluggable — the
default implementations are real, invertible raw-PCM framing (so
round-trips are exactly testable) and the PyAV paths are import-gated.
The Spark-side discipline (per-stream partitioning, sorted input for
stateful codecs, Arrow batching) is production-real. See codec.py,
container.py, inference.py.
"""
