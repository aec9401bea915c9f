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
  core/        Stream wrapper + column conventions (ts, value, stream id)
  functions/   scalar surfaces: calculator expression compiler, strftime
               translation, string matching (reference: system/tasks/*.py)
  operators/   temporal operators: last-value join, ordered merge, gate,
               switch, latch, detector, buffers (reference: system/tasks/)
  relational/  joins/aggregates/windows/set-ops surface + TPC-H-ish queries
  llmdata/     large-scale training-data ops: dedup (exact/minhash/simhash/
               jaccard), ANN similarity, text analysis, multimodal plumbing
  streaming/   Structured Streaming sources/sinks/stateful variants
  plans/       Pipeline (deployment equivalent): named DAG of stages
"""

from streamtasks_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
