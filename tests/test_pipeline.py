"""Pipeline veneer tests — the reference's own test pattern (tiny
generator, golden list computed inline; SURVEY.md 5.1) translated to
DataFrames."""

import pytest
from pyspark.sql import functions as F

from pypiper_spark.pipeline import BATCH_SIZE_ALL, MapBatches, Node, Pipeline, node


@pytest.fixture()
def gen10(spark):
    return spark.range(10)  # the reference Generate(size=10) analog


def test_chain_square_then_filter(spark, gen10):
    square = Node("square", lambda df: df.select((F.col("id") * F.col("id")).alias("sq")))
    big = Node("big", lambda df: df.filter(F.col("sq") > 20))
    out = (square | big).run(gen10)
    assert sorted(r.sq for r in out.collect()) == [25, 36, 49, 64, 81]


def test_node_decorator_and_str(spark, gen10):
    @node("double")
    def double(df):
        return df.select((F.col("id") * 2).alias("id"))

    pipe = double | Node("half", lambda df: df.select((F.col("id") / 2).alias("id")))
    assert str(pipe) == "double | half"
    assert sorted(r.id for r in pipe.run(gen10).collect()) == [float(i) for i in range(10)]


def test_fanout_branches_see_all_rows(spark, gen10):
    evens = Node("evens", lambda df: df.filter(F.col("id") % 2 == 0))
    sq = Node("square", lambda df: df.select((F.col("id") * F.col("id")).alias("v")))
    dbl = Node("double", lambda df: df.select((F.col("id") * 2).alias("v")))
    b1, b2 = (evens | [sq, dbl]).run(gen10)
    assert sorted(r.v for r in b1.collect()) == [0, 4, 16, 36, 64]
    assert sorted(r.v for r in b2.collect()) == [0, 4, 8, 12, 16]


def test_fanout_must_be_terminal(spark):
    a, b, c = Node("a", lambda d: d), Node("b", lambda d: d), Node("c", lambda d: d)
    pipe = Pipeline(a, [Pipeline(b), Pipeline(c)], a)
    with pytest.raises(ValueError, match="terminal"):
        pipe.run(None)


def test_map_batches_arrow_path(spark, gen10):
    half = MapBatches("half", lambda p: p.assign(id=p.id / 2), "id double")
    out = (Node("noop", lambda d: d) | half).run(gen10)
    assert sorted(r.id for r in out.collect()) == [i / 2 for i in range(10)]


def test_batch_size_all_is_a_named_constant():
    # the reference's Node.BATCH_SIZE_ALL maps to distributed global ops
    assert BATCH_SIZE_ALL == -1


def test_n_threads_sets_run_parallelism(spark, gen10):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        agg = Node("agg", lambda df: df.groupBy((F.col("id") % 2).alias("k")).count())
        pipe = Pipeline(agg, n_threads=3)
        out = pipe.run(gen10)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
        assert out.count() == 2
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_explain_renders_plan(spark, gen10):
    sq = Node("square", lambda df: df.select((F.col("id") * F.col("id")).alias("sq")))
    text = Pipeline(sq).explain(gen10)
    assert "Range" in text  # source shows up in the physical plan


def test_named_out_streams_and_in_streams(spark, gen10):
    """Port of a reference-style multi-output node (A8): a node that
    emits two named streams ("odd", "even"-ish values per item), and
    two downstream consumers each declaring the stream they read."""
    splitter = Node(
        "splitter",
        lambda df: df.select(
            (F.col("id") * 2).alias("_c0"), (F.col("id") * 2 + 1).alias("_c1")
        ),
        out_streams=["even", "odd"],
    )
    take_even = Node("take_even", lambda df: df, in_streams=["even"])
    take_odd = Node("take_odd", lambda df: df, in_streams=["odd"])
    evens = (splitter | take_even).run(gen10)
    odds = (splitter | take_odd).run(gen10)
    assert evens.columns == ["even"]
    assert odds.columns == ["odd"]
    assert sorted(r.even for r in evens.collect()) == [2 * i for i in range(10)]
    assert sorted(r.odd for r in odds.collect()) == [2 * i + 1 for i in range(10)]


def test_named_streams_errors(spark, gen10):
    import pytest as _pytest

    bad_out = Node(
        "bad_out",
        lambda df: df.select("id"),
        out_streams=["a", "b"],  # run() emits 1 column
    )
    with _pytest.raises(ValueError, match="out_streams"):
        Pipeline(bad_out).run(gen10)
    bad_in = Node("bad_in", lambda df: df, in_streams=["nope"])
    with _pytest.raises(ValueError, match="in_streams"):
        Pipeline(bad_in).run(gen10)


def test_fanout_direct_construction_honors_named_streams(spark, gen10):
    """ADVICE r5: a directly-constructed Pipeline(a, [node_b, node_c])
    must normalize bare Nodes in the fan-out list into Pipelines so
    branch in_streams/out_streams go through _apply() — previously only
    the __or__ path did this and direct construction silently ignored
    them."""
    splitter = Node(
        "splitter",
        lambda df: df.select(
            (F.col("id") * 2).alias("_c0"), (F.col("id") * 2 + 1).alias("_c1")
        ),
        out_streams=["even", "odd"],
    )
    take_even = Node("take_even", lambda df: df, in_streams=["even"])
    take_odd = Node("take_odd", lambda df: df, in_streams=["odd"])
    with Pipeline(splitter, [take_even, take_odd]) as p:
        evens, odds = p.run(gen10)
        assert evens.columns == ["even"]
        assert odds.columns == ["odd"]
        assert sorted(r.even for r in evens.collect()) == [2 * i for i in range(10)]
        assert sorted(r.odd for r in odds.collect()) == [2 * i + 1 for i in range(10)]
