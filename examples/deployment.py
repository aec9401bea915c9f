#!/usr/bin/env python
"""A reference-style deployment, end to end: the dataflow graph a
streamtasks user would wire in the web UI (PulseGenerator → Calculator
→ Gate → viewer), declared as a Pipeline and run as Structured
Streaming queries.

Graph (reference task classes in parentheses):

    pulse (PulseGenerator, 20 Hz)
      └─ calc (Calculator: "sin(t) * 10 + 10" over the tick index)
           ├─ data  (NumberMessage stream)
           └─ ctl   (Gate control: open while calc > 10)
                └─ gated (Gate) ──> memory viewer
                               └──> websocket viewer (WebViewer:
                                    browsers at ws://host/topic/gated)

Run: python examples/deployment.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamtasks_spark.functions.calculator import compile_column
from streamtasks_spark.plans import Pipeline
from streamtasks_spark.session import get_spark
from streamtasks_spark.streaming.sources import pulse_generator
from streamtasks_spark.streaming.stateful import streaming_gate


def main() -> None:
    spark = get_spark("example_deployment")
    p = Pipeline("sine-gate-demo")
    p.source("pulse", lambda s: pulse_generator(s, interval_ms=50))
    p.stage(
        "calc",
        lambda df: df.withColumn("tick", F.unix_micros("ts") / 1e6)
        .withColumn(
            "value",
            compile_column("sin(t) * 10 + 10", {"t": F.col("tick")}),
        )
        .withColumn("key", F.lit(1)),
        "pulse",
    )
    p.stage(
        "ctl",
        lambda calc: calc.select(
            "key", "ts",
            (F.col("value") > 10).cast("double").alias("value"),
        ),
        "calc",
    )
    p.stage(
        "gated",
        lambda calc, ctl: streaming_gate(calc, ctl, keys=["key"]),
        "calc", "ctl",
    )
    # identity stage: sinks are keyed by stage name, so fanning one
    # stream out to a second sink (memory viewer AND browsers) takes an
    # alias — the reference UI does the same by subscribing a second
    # viewer to the topic
    p.stage("gated_ws", lambda g: g, "gated")
    # ignore_cleanup_errors: query.stop() returns while executor tasks
    # can still be flushing state-store files into the checkpoint dir,
    # so rmtree can race a concurrent write (observed as ENOTEMPTY on
    # a state-store subdir); the files land in /tmp either way
    from streamtasks_spark.streaming.webviewer import TopicWebSocketServer

    ws = TopicWebSocketServer()
    print(f"web viewer listening: {ws.url}/topic/gated")
    with tempfile.TemporaryDirectory(
        prefix="deploy_demo_", ignore_cleanup_errors=True
    ) as td:
        queries = p.start(
            spark,
            sinks={
                "gated": {
                    "format": "memory",
                    "outputMode": "append",
                    "checkpointLocation": f"{td}/ckpt",
                },
                # the same stage can also fan out to browsers — the
                # reference web UI's topic stream
                "gated_ws": {
                    "format": "websocket",
                    "server": ws,
                    "topic": "gated",
                    "checkpointLocation": f"{td}/ckpt_ws",
                },
            },
        )
        qname = queries[0].name
        print(f"deployment started: {qname}")
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(qname).count() < 5:
            time.sleep(0.5)
        rows = spark.table(qname).orderBy("ts").collect()
        p.stop()
    ws.close()
    print(f"gate passed {len(rows)} rows (sine above midline); first few:")
    for r in rows[:5]:
        print(f"  {r['ts']}  value={r['value']:.3f}")
    assert rows and all(r["value"] > 10 for r in rows)
    print("ok")


if __name__ == "__main__":
    main()
