"""Pipeline — the deployment layer (reference task_web.py:267-316).

The reference stores tasks + topic wiring as a named deployment, then
schedule/start/stop runs the graph. Spark analog: a named DAG of stages
over DataFrames —

    p = Pipeline("volume-pipeline")
    p.source("events", lambda spark: read_parquet(spark, path))
    p.stage("clicks", lambda ev: ev.filter(...), "events")
    p.stage("gated", lambda d, c: gate(d, c, keys=["user_id"]),
            "clicks", "controls")
    dfs = p.materialize(spark)          # batch: build all DataFrames
    queries = p.start(spark, sinks={"gated": sink_cfg})  # streaming

Lifecycle mapping (reference → here):
- StoredTask graph + topic wiring (task_web.py:48-55) → named stages +
  string dependencies; ``validate()`` ≈ schedule (cycle/dangling check,
  discovery.py topic-space allocation has no batch analog beyond
  per-run naming).
- start (task_web.py:286-298) → ``materialize`` (batch, lazy DataFrames
  — Catalyst plans the whole DAG jointly, so shared upstream stages
  dedupe in the optimized plan) or ``start`` (streaming: one
  ``writeStream`` per sink stage, per-run checkpoint namespace ≈ topic
  space).
- stop (task_web.py:300-316) → ``stop`` (stop all started queries).
"""

from __future__ import annotations

import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


class PipelineError(ValueError):
    pass


class Pipeline:
    def __init__(self, name: str):
        self.name = name
        self._stages: dict[str, tuple[Callable, tuple[str, ...]]] = {}
        self._queries: list = []

    # ------------------------------------------------------- definition

    def source(self, name: str, fn: Callable[[SparkSession], DataFrame]) -> "Pipeline":
        """A stage with no upstream dependencies; fn(spark) -> DataFrame."""
        return self.stage(name, fn)

    def stage(self, name: str, fn: Callable, *inputs: str) -> "Pipeline":
        """A named transformation; ``fn`` receives the materialized
        DataFrames of ``inputs`` (or the SparkSession for sources)."""
        if name in self._stages:
            raise PipelineError(f"duplicate stage {name!r}")
        self._stages[name] = (fn, tuple(inputs))
        return self

    # ------------------------------------------------------- lifecycle

    def validate(self) -> list[str]:
        """Schedule-time checks: dangling deps + cycles. Returns a
        topological order of the stages."""
        for name, (_, deps) in self._stages.items():
            for d in deps:
                if d not in self._stages:
                    raise PipelineError(f"stage {name!r} depends on unknown {d!r}")
        order: list[str] = []
        state: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(n: str, chain: tuple[str, ...]):
            if state.get(n) == 1:
                return
            if state.get(n) == 0:
                raise PipelineError(f"cycle: {' -> '.join(chain + (n,))}")
            state[n] = 0
            for d in self._stages[n][1]:
                visit(d, chain + (n,))
            state[n] = 1
            order.append(n)

        for n in self._stages:
            visit(n, ())
        return order

    def materialize(
        self, spark: SparkSession, only: Sequence[str] | None = None
    ) -> dict[str, DataFrame]:
        """Build every stage's DataFrame (lazy — no jobs run). ``only``
        restricts the result dict, not the build (upstreams are always
        built; Catalyst dedupes shared subplans at execution)."""
        order = self.validate()
        built: dict[str, DataFrame] = {}
        for n in order:
            fn, deps = self._stages[n]
            built[n] = fn(spark) if not deps else fn(*[built[d] for d in deps])
        if only is not None:
            return {n: built[n] for n in only}
        return built

    def start(
        self,
        spark: SparkSession,
        sinks: dict[str, dict],
        *,
        checkpoint_root: str = "/tmp/streamtasks_spark_ckpt",
        run_id: str | None = None,
    ) -> list:
        """Streaming run: one writeStream per sink stage. ``sinks`` maps
        stage name → writer options (format, outputMode, options...).
        Checkpoints live under a per-run namespace (the reference's
        topic-space isolation, discovery.py:83-109). Pass the same
        ``run_id`` across invocations to RESUME the deployment from its
        checkpoints — source offsets and operator state carry over, so
        a stopped graph picks up where it left off (the reference's
        deployment stop/start lifecycle, task_web.py:286-316); omit it
        for a fresh isolated run."""
        run_id = run_id or uuid.uuid4().hex[:12]
        built = self.materialize(spark)
        for stage_name, cfg in sinks.items():
            df = built[stage_name]
            if not df.isStreaming:
                raise PipelineError(f"sink stage {stage_name!r} is not streaming")
            if cfg.get("format") == "websocket":
                # browser push (the reference deployment's web-UI topic
                # stream): cfg carries a TopicWebSocketServer under
                # "server"; browsers subscribe at /topic/<topic>
                # (default: the stage name). See streaming/webviewer.py.
                from streamtasks_spark.streaming.webviewer import (
                    topic_push_batch,
                )

                server = cfg.get("server")
                if server is None:
                    raise PipelineError(
                        f"websocket sink {stage_name!r} needs a 'server' "
                        "(streaming.webviewer.TopicWebSocketServer)"
                    )
                writer = (
                    df.writeStream.foreachBatch(
                        topic_push_batch(
                            server,
                            cfg.get("topic", stage_name),
                            cfg.get("pause_col"),
                        )
                    )
                    .outputMode(cfg.get("outputMode", "append"))
                    .option(
                        "checkpointLocation",
                        cfg.get(
                            "checkpointLocation",
                            f"{checkpoint_root}/{self.name}/{run_id}/"
                            f"{stage_name}",
                        ),
                    )
                )
                for k, v in cfg.get("options", {}).items():
                    writer = writer.option(k, v)
                if "trigger" in cfg:
                    writer = writer.trigger(**cfg["trigger"])
                self._queries.append(writer.start())
                continue
            writer = (
                df.writeStream.format(cfg.get("format", "parquet"))
                .outputMode(cfg.get("outputMode", "append"))
                .option(
                    "checkpointLocation",
                    cfg.get(
                        "checkpointLocation",
                        f"{checkpoint_root}/{self.name}/{run_id}/{stage_name}",
                    ),
                )
                .queryName(
                    # memory-sink view names reject hyphens/dots — keep
                    # deployment names unrestricted, sanitize here
                    "".join(
                        c if c.isalnum() or c == "_" else "_"
                        for c in f"{self.name}_{run_id}_{stage_name}"
                    )
                )
            )
            for k, v in cfg.get("options", {}).items():
                writer = writer.option(k, v)
            if "trigger" in cfg:
                # e.g. {"availableNow": True} for a bounded drain of the
                # backlog (the reference's run-to-completion replay mode),
                # or {"processingTime": "5 seconds"}
                writer = writer.trigger(**cfg["trigger"])
            if "path" in cfg:
                self._queries.append(writer.start(cfg["path"]))
            else:
                self._queries.append(writer.start())
        return list(self._queries)

    def stop(self) -> None:
        for q in self._queries:
            try:
                q.stop()
            finally:
                pass
        self._queries.clear()
