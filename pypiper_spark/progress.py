"""Progress reporting (reference A14: ``quiet=False`` /
``update_callback`` on Pipeline; SURVEY.md 2A).

The reference ticks its callback per item pushed through the queue;
the Spark analog is stage/task progress from the StatusTracker,
sampled by a daemon thread while an action runs. No listener JVM
plumbing — pure public PySpark API, works on any session.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class ProgressSample:
    active_stages: int
    active_tasks: int
    completed_tasks: int
    total_tasks: int


class track_progress:
    """Context manager: samples task progress while the body runs.

    >>> with track_progress(spark, callback=print):
    ...     df.collect()

    The callback receives ProgressSample; samples land every
    ``interval`` seconds while any job is active. Samples are also
    collected on the instance (``.samples``) for quiet inspection.
    """

    def __init__(
        self,
        spark: SparkSession,
        callback: Callable[[ProgressSample], None] | None = None,
        interval: float = 0.05,
    ):
        self._spark = spark
        self._callback = callback
        self._interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.samples: list[ProgressSample] = []

    def _poll(self) -> None:
        tracker = self._spark.sparkContext.statusTracker()
        while not self._stop.is_set():
            try:
                stage_ids = tracker.getActiveStageIds()
                active = completed = total = 0
                for sid in stage_ids:
                    info = tracker.getStageInfo(sid)
                    if info is None:
                        continue
                    active += info.numActiveTasks
                    completed += info.numCompletedTasks
                    total += info.numTasks
                if stage_ids:
                    sample = ProgressSample(
                        active_stages=len(stage_ids),
                        active_tasks=active,
                        completed_tasks=completed,
                        total_tasks=total,
                    )
                    self.samples.append(sample)
                    if self._callback is not None:
                        self._callback(sample)
            except Exception:  # session shutting down mid-poll
                break
            time.sleep(self._interval)

    def __enter__(self) -> "track_progress":
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)


def observed_metrics(df, name: str = "pipeline_metrics", **metric_cols):
    """In-plan metrics via DataFrame.observe — the production way to
    count/aggregate what flows through a pipeline stage WITHOUT a
    second action (the reference's per-item counters tick in its push
    loop for free; a naive Spark translation re-runs the DAG per
    counter). The observed aggregates ride the actual job; read them
    back from df.attrs after an action via `collect_observed`.

    >>> df2, get = observed_metrics(df, rows=F.count(F.lit(1)))
    >>> df2.write.format("noop").save(); get()["rows"]
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *[v.alias(k) for k, v in metric_cols.items()])
    return out, lambda: obs.get
