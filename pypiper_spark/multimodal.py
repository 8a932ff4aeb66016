"""Multimodal column plumbing (SURVEY.md 2B / task north star).

The testdata has no real media, so this module makes the SPARK-SIDE
contract real — opaque ``binary`` payload column + typed metadata
struct + Arrow-batched feature extraction via mapInPandas — while the
actual media decoding is stubbed:

- ``decode_image_real`` raises NotImplementedError unless an imaging
  library exists in the environment (none does in this container);
- ``fake_payload`` derives a deterministic 16-byte payload from the
  document text (md5 digest bytes), so the whole path is testable and
  reproducible.

At 100 TB the pattern is exactly this shape: binary + metadata columns
in parquet, mapInPandas over Arrow batches with a bounded
maxRecordsPerBatch so payloads fit executor memory, features emitted
as narrow typed columns.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pypiper_spark.registry import register

FEATURE_SCHEMA = (
    "doc_id long, fmt string, byte_len int, first_byte int, last_byte int, checksum long"
)


def with_fake_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + typed metadata struct."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5(F.col("text").cast("binary"))).alias("payload"),
        F.struct(
            F.lit("fake16").alias("fmt"),
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
        ).alias("media_meta"),
    )


def decode_image_real(payload: bytes) -> object:
    """Real media decode — intentionally stubbed (no imaging libs in
    this environment). The Spark plumbing around it is real."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media decoding requires an imaging library not present in "
            "this environment; use the deterministic fake path"
        ) from e
    raise NotImplementedError("real decode path not wired in this build")


def _extract(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fmt": [m["fmt"] for m in pdf["media_meta"]],
                "byte_len": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(lambda b: b[0]).astype("int32"),
                "last_byte": payloads.map(lambda b: b[-1]).astype("int32"),
                "checksum": payloads.map(lambda b: sum(b)).astype("int64"),
            }
        )


def extract_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    return docs_with_payload.mapInPandas(_extract, schema=FEATURE_SCHEMA)


@register("q_multimodal_decode", oracle=None, tags=("multimodal", "binary"))
def multimodal_decode(spark, sf_dir: str) -> DataFrame:
    """Binary payload -> per-item features via mapInPandas (rows-only:
    byte-level work isn't SQL-expressible in the oracle; pytest checks
    the values against an independent Python md5 computation)."""
    from pypiper_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_fake_payload(docs))
