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


RESIZE_SCHEMA = "doc_id long, fmt string, width int, height int, payload binary"


def _resize(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    # deterministic fake resize: halve each dimension by keeping every
    # other byte of the payload (a real impl decodes + interpolates;
    # the Spark-side contract — schema in, schema out, Arrow batches —
    # is identical)
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fmt": [m["fmt"] + "_half" for m in pdf["media_meta"]],
                "width": [m["width"] // 2 for m in pdf["media_meta"]],
                "height": [m["height"] // 2 for m in pdf["media_meta"]],
                "payload": pdf["payload"].map(lambda b: b[::2]),
            }
        )


def resize_media(docs_with_payload: DataFrame) -> DataFrame:
    """Resize op over the binary column (decode step faked, plumbing real)."""
    return docs_with_payload.mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"
_FRAME_BYTES = 4
_FRAME_STRIDE = 2  # sample every 2nd frame


def _frame_sample(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    # treat the payload as a sequence of 4-byte frames; emit every
    # STRIDE-th frame as its own row (1 -> n, video frame sampling shape)
    for pdf in batches:
        ids, idxs, frames = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload) // _FRAME_BYTES
            for i in range(0, n, _FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(i)
                frames.append(payload[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES])
        yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})


def sample_frames(docs_with_payload: DataFrame) -> DataFrame:
    """Frame-sampling op: binary payload -> one row per sampled frame."""
    return docs_with_payload.mapInPandas(_frame_sample, schema=FRAME_SCHEMA)


@register("q_multimodal_resize", oracle=None, tags=("multimodal", "binary"))
def multimodal_resize(spark, sf_dir: str) -> DataFrame:
    """Resize over the fake binary payloads (rows-only; pytest checks
    the byte-level contract against Python)."""
    from pypiper_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return resize_media(with_fake_payload(docs))


@register("q_multimodal_frames", oracle=None, tags=("multimodal", "binary"))
def multimodal_frames(spark, sf_dir: str) -> DataFrame:
    """Frame sampling over the fake payloads (rows-only)."""
    from pypiper_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(with_fake_payload(docs))


@register("q_multimodal_decode", oracle=None, tags=("multimodal", "binary"))
def multimodal_decode(spark, sf_dir: str) -> DataFrame:
    """Binary payload -> per-item features via mapInPandas (rows-only:
    byte-level work isn't SQL-expressible in the oracle; pytest checks
    the values against an independent Python md5 computation)."""
    from pypiper_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_fake_payload(docs))
