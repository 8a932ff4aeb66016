"""The reference's n_threads parity test, translated (SURVEY.md 5.2.3):
identical value-hash at shuffle.partitions {1, 32} and AQE off/on.
This is the 'same bits on a 1000-executor cluster' guarantee."""

import pytest

from pypiper_spark.registry import all_queries
from tools.driver_sim import value_hash

SAMPLE = [
    "q_pricing_summary",
    "q_agg_group",
    "q_join_multiway",
    "q_join_theta_range",
    "q_win_frame_rows",
    "q_stream_session",
    "q_text_tfidf",
    "q_dedup_ngram_jaccard",
    "q_sim_topk_bruteforce",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_hash_stable_across_parallelism(spark, sf_dir, name):
    spec = all_queries()[name]
    hashes = set()
    try:
        for parts, aqe in [(1, "false"), (32, "true")]:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            hashes.add(value_hash(spec.fn(spark, sf_dir).toPandas()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert len(hashes) == 1, f"{name}: result depends on partitioning"
