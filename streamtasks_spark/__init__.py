"""streamtasks_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of leopf/streamtasks (reference read-only at
/root/reference), re-expressed Spark-first.

The reference is an asyncio pub/sub dataflow orchestrator: tasks (operators)
wired by topics (timestamped message streams). Here every topic is a
DataFrame with an event-time column, every task is a DataFrame
transformation, and every deployment is a `Pipeline` of named stages.
Batch tables and streams share one operator vocabulary, so every operator is
checkable against a SQL oracle in batch mode and runs under Structured
Streaming unchanged where Spark's streaming rules allow.

Layout:
  core/        Stream wrapper: DataFrame + (ts, keys, seq) metadata with
               the operator vocabulary as fluent methods
  functions/   scalar surfaces: calculator expression compiler, strftime
               translation, string matching, fn_task UDF decorator
  operators/   temporal + chunked operators: last-value join, ordered
               merge, as-of join, gate/switch/latch/detector, buffers,
               repeater, replay, interleave mux, meters/mixers/resampler
  relational/  joins/aggregates/windows/set-ops surface + TPC-H-ish queries
  llmdata/     training-data ops: dedup (exact/minhash-LSH/simhash/
               jaccard), ANN similarity, text analysis, multimodal decode
  media/       codec/container/inference/render plumbing (pluggable
               kernels; PyAV import-gated, stubs deterministic)
  streaming/   Structured Streaming sources/sinks/stateful twins
  plans/       Pipeline (deployment equivalent): named DAG of stages
"""

from streamtasks_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
