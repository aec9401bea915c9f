"""Deployment layer: named stage DAGs with schedule/start/stop lifecycle
(reference task_web.py:267-316). See plans/pipeline.py."""

from streamtasks_spark.plans.pipeline import Pipeline, PipelineError

__all__ = ["Pipeline", "PipelineError"]
