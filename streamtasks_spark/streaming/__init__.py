"""Structured Streaming tier: sources (pulse generator, parquet/UI-input
streams), viewer sinks, and stateful operator twins (gate, switch, SR
latch, pause propagation, last-value join, ordered merge with
drop-late, message detector with processing-time timers, clock-mode
time buffer, exact dedup via dropDuplicatesWithinWatermark) and native
watermarked window aggregations (tumbling hourly, gap-based sessions) —
each test-verified equal to its batch formulation in ``operators/`` /
``relational/`` on the same data. See sources.py, sinks.py,
stateful.py, windows.py."""
