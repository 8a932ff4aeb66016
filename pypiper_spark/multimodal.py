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


def with_pgm_payload(docs: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Attach a VALID binary PGM (P5) image payload, built entirely
    JVM-side: netpbm header literal + pixel bytes derived from chained
    md5 digests of the text (width*height bytes). The payload is a real
    decodable image — decode_media() parses it with a real PGM decoder,
    no imaging library required."""
    n_digests = (width * height + 15) // 16
    pixels = F.concat(
        *[F.unhex(F.md5(F.concat(F.col("text"), F.lit(str(i)).cast("binary")))) for i in range(n_digests)]
    )
    header = f"P5\n{width} {height}\n255\n".encode()
    return docs.select(
        "doc_id",
        F.concat(F.lit(header), F.substring(pixels, 1, width * height)).alias("payload"),
        F.struct(
            F.lit("pgm").alias("fmt"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
        ).alias("media_meta"),
    )


def decode_image_real(payload: bytes) -> tuple[str, int, int, list[int]]:
    """REAL media decode: parse the bytes as an image and return
    (fmt, width, height, pixel bytes).

    Two codec paths:
    - PGM (netpbm P5): decoded here with a real header parser — pure
      stdlib, always available;
    - anything else: PIL when importable (guarded — compressed codecs
      aren't in this container), else NotImplementedError.
    """
    if payload.startswith(b"P5"):
        # netpbm P5: ASCII header "P5\n<w> <h>\n<maxval>\n" then raw bytes
        parts = payload.split(b"\n", 3)
        if len(parts) < 4:
            raise ValueError("truncated PGM header")
        w, h = (int(x) for x in parts[1].split())
        maxval = int(parts[2])
        if maxval > 255:
            raise NotImplementedError("16-bit PGM not supported")
        pix = parts[3][: w * h]
        if len(pix) != w * h:
            raise ValueError(f"PGM payload has {len(pix)} pixels, expected {w * h}")
        return ("pgm", w, h, list(pix))
    try:
        import io

        import PIL.Image
    except ImportError as e:
        raise NotImplementedError(
            "compressed codecs require an imaging library not present in "
            "this environment; PGM payloads decode natively"
        ) from e
    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    return (img.format.lower() if img.format else "unknown", img.width, img.height, list(img.getdata()))


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


# ---------------------------------------------------------------------------
# DuckDB twins for the multimodal queries (round 9).
#
# The payloads are deterministic functions of the document text (md5
# digest bytes assembled JVM-side), and DuckDB has the same md5 — so
# the DECODED results are exactly recomputable in ANSI SQL: rebuild
# the digest hex string, decode byte i as ('0x' || substr(hx, 2i+1,
# 2))::INT, and aggregate with list_transform/list_aggregate. That
# turns the whole binary path — payload build, Arrow batching, the
# REAL PGM/WAV parsers — into exact-hash oracle rows: a single byte
# drifting anywhere (header arithmetic, frame slicing, PCM centering)
# flips the hash. Only the codec itself is synthetic; the verification
# is byte-for-byte.
# ---------------------------------------------------------------------------

def _sql_byte(hx: str, i: str) -> str:
    """DuckDB expr for byte ``i`` (0-based) of hex string ``hx``."""
    return f"('0x' || substr({hx}, 2*({i})+1, 2))::INT"


_MM_DECODE_ORACLE = f"""
  WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
  SELECT doc_id,
         'fake16' AS fmt,
         16 AS byte_len,
         {_sql_byte('hx', '0')} AS first_byte,
         {_sql_byte('hx', '15')} AS last_byte,
         CAST(list_aggregate(
           list_transform(range(0, 16), i -> {_sql_byte('hx', 'i')}::BIGINT),
           'sum') AS BIGINT) AS checksum
  FROM h
"""

_MM_RESIZE_ORACLE = """
  WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
  SELECT doc_id,
         'fake16_half' AS fmt,
         2 AS width,
         2 AS height,
         substr(hx, 1, 2) || substr(hx, 5, 2) || substr(hx, 9, 2)
           || substr(hx, 13, 2) || substr(hx, 17, 2) || substr(hx, 21, 2)
           || substr(hx, 25, 2) || substr(hx, 29, 2) AS payload_hex
  FROM h
"""

_MM_FRAMES_ORACLE = """
  WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
  SELECT doc_id, fi.frame_idx,
         substr(hx, 8 * fi.frame_idx + 1, 8) AS frame_hex
  FROM h, (VALUES (0), (2)) AS fi(frame_idx)
"""


@register("q_multimodal_resize", oracle=_MM_RESIZE_ORACLE, tags=("multimodal", "binary"))
def multimodal_resize(spark, sf_dir: str) -> DataFrame:
    """Resize over the fake binary payloads. The resized payload is
    registered as lowercase hex (raw binary cells crash the driver's
    canonicalizer, same rule as arrays); the DuckDB twin rebuilds the
    every-other-byte slice directly from the md5 hex string, so the
    hash checks the resize kernel byte-for-byte."""
    from pypiper_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return resize_media(with_fake_payload(docs)).select(
        "doc_id",
        "fmt",
        "width",
        "height",
        F.lower(F.hex("payload")).alias("payload_hex"),
    )


@register("q_multimodal_frames", oracle=_MM_FRAMES_ORACLE, tags=("multimodal", "binary"))
def multimodal_frames(spark, sf_dir: str) -> DataFrame:
    """Frame sampling over the fake payloads: 4-byte frames, every
    2nd sampled (indices 0 and 2 of a 16-byte payload). Frames are
    registered as hex so the DuckDB twin can restate each frame as a
    substring of the md5 hex — an off-by-one in the frame slicing
    arithmetic flips the hash."""
    from pypiper_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(with_fake_payload(docs)).select(
        "doc_id",
        "frame_idx",
        F.lower(F.hex("frame")).alias("frame_hex"),
    )


@register("q_multimodal_decode", oracle=_MM_DECODE_ORACLE, tags=("multimodal", "binary"))
def multimodal_decode(spark, sf_dir: str) -> DataFrame:
    """Binary payload -> per-item features via mapInPandas. Exact
    oracle: the fake payload is the md5 digest of the text, so the
    twin recomputes first/last byte and the byte checksum from
    DuckDB's own md5 — the Arrow feature kernel is hash-checked
    value-for-value (pytest additionally checks an independent Python
    md5 recompute)."""
    from pypiper_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_fake_payload(docs))


DECODE_SCHEMA = (
    "doc_id long, fmt string, width int, height int, "
    "mean_pixel double, min_pixel int, max_pixel int"
)


def _decode_batch(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "fmt", "width", "height", "mean_pixel", "min_pixel", "max_pixel")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            fmt, w, h, pix = decode_image_real(bytes(payload))
            a = np.asarray(pix, dtype=np.float64)
            rows["doc_id"].append(doc_id)
            rows["fmt"].append(fmt)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["mean_pixel"].append(round(float(a.mean()), 6))
            rows["min_pixel"].append(int(a.min()))
            rows["max_pixel"].append(int(a.max()))
        yield pd.DataFrame(rows)


def decode_media(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: parses each binary payload as an
    image (PGM natively; other codecs via guarded PIL) and emits pixel
    statistics. This is actual bytes -> pixels -> features, not a
    metadata passthrough."""
    return docs_with_payload.mapInPandas(_decode_batch, schema=DECODE_SCHEMA)


_MM_PGM_ORACLE = f"""
  WITH h AS (
    SELECT doc_id,
           md5(text || '0') || md5(text || '1')
             || md5(text || '2') || md5(text || '3') AS hx
    FROM documents
  ), px AS (
    SELECT doc_id,
           list_transform(range(0, 64), i -> {_sql_byte('hx', 'i')}) AS p
    FROM h
  )
  SELECT doc_id, 'pgm' AS fmt, 8 AS width, 8 AS height,
         round(list_aggregate(p, 'sum') / 64.0, 6) AS mean_pixel,
         list_aggregate(p, 'min') AS min_pixel,
         list_aggregate(p, 'max') AS max_pixel
  FROM px
"""


@register(
    "q_multimodal_decode_real",
    oracle=_MM_PGM_ORACLE,
    tags=("multimodal", "binary", "decode"),
)
def multimodal_decode_real(spark, sf_dir: str) -> DataFrame:
    """Real codec path: valid PGM payloads built JVM-side, decoded with
    a real netpbm parser in the Pandas UDF, per-image pixel stats out.
    Exact oracle: the pixel bytes are chained md5 digests of the text,
    so the DuckDB twin rebuilds the same 64 pixels from its own md5
    and recomputes mean/min/max — header parsing, payload slicing and
    the stats kernel are all hash-checked (mean_pixel is a /64
    division, exactly representable in 6 decimals, so the round is
    lossless on both engines); pytest additionally round-trips the
    payloads through an independent decoder."""
    from pypiper_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return decode_media(with_pgm_payload(docs))


# ---------------------------------------------------------------------------
# Audio: real WAV (RIFF/PCM) payloads decoded with the stdlib wave module
# ---------------------------------------------------------------------------

_WAV_SAMPLES = 64
_WAV_RATE = 8000


def _wav_header(n_samples: int, sample_rate: int) -> bytes:
    """44-byte canonical RIFF header for 8-bit mono PCM."""
    import struct

    data_size = n_samples  # 1 byte/sample
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate, 1, 8)
        + b"data"
        + struct.pack("<I", data_size)
    )


def with_wav_payload(docs: DataFrame, n_samples: int = _WAV_SAMPLES) -> DataFrame:
    """Attach a VALID 8-bit mono PCM WAV payload built JVM-side: the
    fixed 44-byte RIFF header as a binary literal + sample bytes from
    chained md5 digests of the text. Every payload is a real playable
    WAV file — ``decode_audio_real`` parses it with the stdlib
    ``wave`` reader, no audio library required."""
    n_digests = (n_samples + 15) // 16
    samples = F.concat(
        *[
            F.unhex(F.md5(F.concat(F.col("text"), F.lit(f"wav{i}").cast("binary"))))
            for i in range(n_digests)
        ]
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(_wav_header(n_samples, _WAV_RATE)),
            F.substring(samples, 1, n_samples),
        ).alias("payload"),
        F.struct(
            F.lit("wav").alias("fmt"),
            F.lit(_WAV_RATE).alias("sample_rate"),
            F.lit(n_samples).alias("n_samples"),
        ).alias("media_meta"),
    )


def decode_audio_real(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL audio decode via the stdlib ``wave`` reader: returns
    (n_channels, sample_rate, n_samples, pcm bytes). Raises on
    malformed RIFF — this is an actual parser, not a passthrough."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        if w.getsampwidth() != 1:
            raise NotImplementedError("only 8-bit PCM supported here")
        return (
            w.getnchannels(),
            w.getframerate(),
            w.getnframes(),
            w.readframes(w.getnframes()),
        )


AUDIO_SCHEMA = (
    "doc_id long, fmt string, sample_rate int, n_samples int, "
    "duration_ms double, rms double, peak int"
)


def _decode_audio_batch(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = {
            k: []
            for k in (
                "doc_id", "fmt", "sample_rate", "n_samples",
                "duration_ms", "rms", "peak",
            )
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _, rate, n, pcm = decode_audio_real(bytes(payload))
            # 8-bit PCM is unsigned, centered at 128
            a = np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0
            rows["doc_id"].append(doc_id)
            rows["fmt"].append("wav")
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(n)
            rows["duration_ms"].append(round(n * 1000.0 / rate, 6))
            rows["rms"].append(round(float(np.sqrt((a * a).mean())), 6))
            rows["peak"].append(int(np.abs(a).max()))
        yield pd.DataFrame(rows)


def decode_audio(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode: RIFF/PCM bytes -> waveform
    statistics (duration, RMS, peak). Bytes -> samples -> features,
    not a metadata passthrough."""
    return docs_with_payload.mapInPandas(_decode_audio_batch, schema=AUDIO_SCHEMA)


_MM_WAV_ORACLE = f"""
  WITH h AS (
    SELECT doc_id,
           md5(text || 'wav0') || md5(text || 'wav1')
             || md5(text || 'wav2') || md5(text || 'wav3') AS hx
    FROM documents
  ), s AS (
    SELECT doc_id,
           list_transform(range(0, 64), i -> {_sql_byte('hx', 'i')} - 128) AS a
    FROM h
  )
  SELECT doc_id, 'wav' AS fmt, 8000 AS sample_rate, 64 AS n_samples,
         8.0 AS duration_ms,
         round(sqrt(list_aggregate(
           list_transform(a, x -> CAST(x * x AS DOUBLE)), 'sum') / 64.0), 6) AS rms,
         list_aggregate(list_transform(a, x -> abs(x)), 'max') AS peak
  FROM s
"""


@register(
    "q_multimodal_audio",
    oracle=_MM_WAV_ORACLE,
    tags=("multimodal", "binary", "audio", "decode"),
)
def multimodal_audio(spark, sf_dir: str) -> DataFrame:
    """Real audio codec path: valid WAV payloads built JVM-side,
    parsed by the stdlib wave reader inside the Pandas UDF, per-clip
    waveform stats out. Exact oracle: the PCM bytes are chained md5
    digests, so the DuckDB twin recomputes RMS/peak over the same
    centered samples (integer sums are exact in double; sqrt is
    IEEE-correctly-rounded in both engines, so round(.,6) agrees) —
    the RIFF header build, the stdlib wave parse and the stats kernel
    are hash-checked end to end; pytest additionally round-trips the
    payloads through an independent decode."""
    from pypiper_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return decode_audio(with_wav_payload(docs))
