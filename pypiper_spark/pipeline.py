"""pyPiper-compatible composition API over Spark DataFrames.

The reference (daniyall/pyPiper, pyPiper/pyPiper.py [U — mount empty
this session, see SURVEY.md section 0]) composes ``Node`` subclasses
with ``|`` into a push-based DAG run by ``Pipeline.run()``. This module
keeps that authoring surface but compiles to a *declarative* DataFrame
plan, so Catalyst/AQE own execution:

- ``Node``            ~ reference ``Node`` (setup/run/emit lifecycle):
                        here a named ``DataFrame -> DataFrame``.
- ``a | b``           ~ ``Node.__or__`` chaining.
- ``a | [b, c]``      ~ fan-out: both branches see every row. The
                        shared parent is cached once (the Spark analog
                        of the reference's queue tee).
- ``Pipeline(...).run()`` ~ eager push execution: here, one action per
                        sink (lazy plan until then).
- ``print(pipeline)`` ~ reference DAG pretty-print: here the Catalyst
                        plan via ``explain``.
- ``batch_size=N``    ~ reference batching: here ``map_batches`` over
                        Arrow record batches (mapInPandas).
- ``BATCH_SIZE_ALL``  ~ whole-stream-in-one-list: deliberately mapped
                        to *distributed* global ops, never coalesce(1)
                        (SURVEY.md section 7.4 — the reference idiom
                        does not survive 100 TB; the semantics do).

Unlike the reference, branches CAN re-join (union/join) — fan-in comes
free from the DataFrame model.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

BATCH_SIZE_ALL = -1  # reference Node.BATCH_SIZE_ALL analog


class Node:
    """A named DataFrame transformation, composable with ``|``.

    Subclass and override ``run(df)`` (the reference's ``run`` analog,
    but over a whole distributed DataFrame instead of one item), or
    pass ``fn`` directly.

    Named streams (reference A8 — ``Node(out_streams=[...])`` names the
    values a node emits per item; a downstream ``Node(in_streams=[...])``
    picks which named streams it consumes): here a "stream" is a named
    column, so ``out_streams`` positionally renames the node's output
    columns and ``in_streams`` selects (by name, in order) the input
    columns the node sees. Both are applied by the pipeline around
    ``run()``, so subclasses stay pure df->df.
    """

    def __init__(
        self,
        name: str,
        fn: Callable[[DataFrame], DataFrame] | None = None,
        *,
        out_streams: Sequence[str] | None = None,
        in_streams: Sequence[str] | None = None,
    ):
        self.name = name
        self._fn = fn
        self.out_streams = list(out_streams) if out_streams is not None else None
        self.in_streams = list(in_streams) if in_streams is not None else None

    def run(self, df: DataFrame) -> DataFrame:
        if self._fn is None:
            raise NotImplementedError(f"Node {self.name!r}: override run() or pass fn")
        return self._fn(df)

    def _apply(self, df: DataFrame) -> DataFrame:
        """run() wrapped with the named-stream plumbing (A8)."""
        if self.in_streams is not None:
            missing = [c for c in self.in_streams if c not in df.columns]
            if missing:
                raise ValueError(
                    f"Node {self.name!r}: in_streams {missing} not produced upstream "
                    f"(available: {df.columns})"
                )
            df = df.select(*self.in_streams)
        out = self.run(df)
        if self.out_streams is not None:
            if len(self.out_streams) != len(out.columns):
                raise ValueError(
                    f"Node {self.name!r}: out_streams names {len(self.out_streams)} "
                    f"streams but run() emitted {len(out.columns)} columns "
                    f"({out.columns})"
                )
            out = out.toDF(*self.out_streams)
        return out

    def __or__(self, other: "Node | Sequence[Node] | Pipeline") -> "Pipeline":
        return Pipeline(self) | other

    def __repr__(self) -> str:
        return f"Node({self.name!r})"


def node(name: str) -> Callable[[Callable[[DataFrame], DataFrame]], Node]:
    """Decorator sugar: ``@node("square")`` over a df->df function."""

    def deco(fn: Callable[[DataFrame], DataFrame]) -> Node:
        return Node(name, fn)

    return deco


class MapBatches(Node):
    """Reference ``batch_size=N`` analog: user code over pandas batches.

    ``fn`` takes a pandas.DataFrame batch and returns one; ``schema``
    is the output schema (DDL string or StructType). Batches arrive via
    Arrow (mapInPandas) — the only sanctioned Python crossing.
    """

    def __init__(self, name: str, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: Any):
        super().__init__(name)
        self._batch_fn = fn
        self._schema = schema

    def run(self, df: DataFrame) -> DataFrame:
        fn = self._batch_fn

        def mapper(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                out = fn(pdf)
                if out is not None and len(out):
                    yield out

        return df.mapInPandas(mapper, schema=self._schema)


class Pipeline:
    """A linear-or-fanned DAG of Nodes applied to a source DataFrame.

    Structure: ``stages`` is a list where each element is either a Node
    (linear stage) or a list of Pipelines (fan-out; terminal, like the
    reference where branches never re-join *within* the pipeline —
    re-join by using the returned branch DataFrames).
    """

    def __init__(self, *stages: "Node | Sequence[Node | Pipeline]", n_threads: int | None = None):
        # n_threads: reference Pipeline(n_threads=N) analog — here it
        # sizes shuffle parallelism for this run (partitions, not
        # threads: Spark's unit of parallelism).
        self.stages: list[Any] = []
        self.n_threads = n_threads
        self._cached: DataFrame | None = None
        self._saved_shuffle: tuple[Any, str | None] | None = None
        for s in stages:
            # Normalize fan-out lists exactly like __or__ does: bare
            # Nodes become single-stage Pipelines so branch run() goes
            # through _apply() and named streams (in_streams /
            # out_streams) are honored on directly-constructed
            # Pipeline(a, [node_b, node_c]) too.
            if isinstance(s, (list, tuple)):
                s = [b if isinstance(b, Pipeline) else Pipeline(b) for b in s]
            self.stages.append(s)

    def __or__(self, other: "Node | Sequence[Node | Pipeline] | Pipeline") -> "Pipeline":
        p = Pipeline(n_threads=self.n_threads)
        p.stages = list(self.stages)
        if isinstance(other, Pipeline):
            p.stages.extend(other.stages)
        elif isinstance(other, Node):
            p.stages.append(other)
        elif isinstance(other, (list, tuple)):
            branches = [b if isinstance(b, Pipeline) else Pipeline(b) for b in other]
            p.stages.append(branches)
        else:
            raise TypeError(f"cannot compose Pipeline with {type(other).__name__}")
        return p

    def run(self, df: DataFrame) -> DataFrame | list[DataFrame]:
        """Apply the DAG to ``df``. Returns the final DataFrame, or one
        DataFrame per branch after a fan-out (reference a | [b, c]).

        Session state owned by this run (the shuffle-partitions conf
        when ``n_threads`` is set, the fan-out parent's cache) lives
        until ``close()`` — the returned DataFrames are lazy, so both
        must stay in effect while the caller runs actions on them.
        ``close()`` is the reference's close()/EOS analog for batch."""
        if self.n_threads is not None and df is not None:
            conf = df.sparkSession.conf
            self._saved_shuffle = (conf, conf.get("spark.sql.shuffle.partitions", None))
            conf.set("spark.sql.shuffle.partitions", str(self.n_threads))
        current = df
        for i, stage in enumerate(self.stages):
            if isinstance(stage, Node):
                current = stage._apply(current)
            elif isinstance(stage, list):
                if i != len(self.stages) - 1:
                    raise ValueError("fan-out must be the terminal stage")
                # Spark analog of the reference's queue tee: cache the
                # shared parent so each branch scans it once. Released
                # by close().
                current.cache()
                self._cached = current
                return [branch.run(current) for branch in stage]
            else:
                raise TypeError(f"bad stage {stage!r}")
        return current

    def close(self) -> None:
        """Release run-scoped session state: restore the
        shuffle-partitions conf and unpersist the fan-out parent.
        Idempotent; safe to call without a prior run()."""
        if self._saved_shuffle is not None:
            conf, prev = self._saved_shuffle
            if prev is None:
                conf.unset("spark.sql.shuffle.partitions")
            else:
                conf.set("spark.sql.shuffle.partitions", prev)
            self._saved_shuffle = None
        if self._cached is not None:
            self._cached.unpersist()
            self._cached = None

    def __enter__(self) -> "Pipeline":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def explain(self, df: DataFrame) -> str:
        """Reference ``print(pipeline)`` analog, but the *real* plan."""
        out = self.run(df)
        frames = out if isinstance(out, list) else [out]
        return "\n".join(f._jdf.queryExecution().toString() for f in frames)  # type: ignore[attr-defined]

    def __str__(self) -> str:
        parts = []
        for s in self.stages:
            if isinstance(s, Node):
                parts.append(s.name)
            elif isinstance(s, list):
                parts.append("[" + ", ".join(str(b) for b in s) + "]")
        return " | ".join(parts)
