"""LLM training-data pipeline operators (BASELINE.json north star).

- :mod:`.dedup` — exact, MinHash-LSH, SimHash, n-gram Jaccard dedup.
- :mod:`.similarity` — cosine top-k / ANN over embedding columns.
- :mod:`.textstats` — token counts, quality scores, language id,
  winnowing fingerprints.
- :mod:`.quality` — Gopher repetition signals, C4-style rule filter,
  per-source corpus audit.
- :mod:`.pipeline` — corpus assembly: benchmark decontamination,
  deterministic stratified sampling, hash-bucketed split assignment.
- :mod:`.bpe` — learned BPE tokenization: merge-table training,
  exact subword counts/fertility, encode, persisted tokenizer.
- :mod:`.multimodal` — binary-column (image/audio blob) plumbing.

Every operator ships with an ``oracle_*_sql`` builder that reproduces the
same algorithm in DuckDB, so the driver's hash-match gate covers the full
pipeline, not just a reference output.
"""
