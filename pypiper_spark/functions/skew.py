"""Skew-resilient join (SURVEY.md scale toolbox: salting).

AQE's skew-join splitting handles most cases at runtime; explicit
salting is for the pathological hot-key join where one key's rows
exceed what any split can balance — the classic 100 TB failure mode.

``salted_join`` replicates the (small-ish) right side ``salt`` times
and scatters the left side's hot keys across the replicas, turning
one giant hash bucket into ``salt`` even ones. Semantics: exactly an
inner equi-join on ``key``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, key: str, salt: int = 8) -> DataFrame:
    """Inner equi-join on ``key`` with salt-scattered left side.

    left gets a random-but-deterministic salt from a hash of its full
    row remainder (never rand() — plan re-execution must be stable);
    right is exploded once per salt value.
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    left_cols = [c for c in left.columns]
    # deterministic scatter: hash the key + a stable discriminator
    scatter = F.pmod(
        F.xxhash64(*[F.col(c) for c in left_cols]), F.lit(salt)
    ).cast("int")
    l_salted = left.withColumn("__salt", scatter)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_salted, [key, "__salt"], "inner").drop("__salt")
    return out
