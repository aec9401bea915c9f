"""Structured Streaming tier: sources (pulse generator, parquet
streams), stateful operator twins (gate / last-value join / ordered
merge with drop-late), matching the batch formulations in
``operators/`` on the same data. See sources.py and stateful.py."""
