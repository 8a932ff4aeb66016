"""Progress reporting (reference update_callback analog)."""

from pypiper_spark.progress import track_progress
from pypiper_spark.registry import all_queries


def test_progress_samples_during_action(spark):
    seen = []
    q = all_queries()["q_text_tfidf"]
    with track_progress(spark, callback=seen.append, interval=0.02) as t:
        # a multi-stage job at sf0.01 runs long enough to sample
        q.fn(spark, "/root/testdata/sf0.01").count()
    assert t.samples, "no progress samples captured during a multi-stage job"
    assert seen == t.samples
    assert all(s.total_tasks >= s.completed_tasks >= 0 for s in t.samples)


def test_progress_noop_when_idle(spark):
    with track_progress(spark, interval=0.02) as t:
        pass
    assert t.samples == []
