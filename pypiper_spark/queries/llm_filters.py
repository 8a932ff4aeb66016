"""Corpus-hygiene operators for LLM training-data pipelines:
benchmark decontamination, Gopher-style repetition filtering, PII
redaction, sequence packing, RAG chunking, and hash-based mixture
sampling.

Together with text.py (quality/langid/fingerprint) and dedup.py
(minhash/simhash/components) these cover the filter stages a real
pretraining pipeline runs between raw crawl and tokenizer. Everything
here is built-in-function only (split / higher-order transforms /
window / regexp) — no Python in the hot path — and every query is
exact-oracled against DuckDB.

Scale notes per query are in the docstrings; the common shape is
scan -> narrow per-doc arrays -> at most one explode + one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pypiper_spark.catalog import load_table
from pypiper_spark.registry import register

# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_DECONTAMINATE_ORACLE = """
  WITH docs AS (
    SELECT doc_id, lang, source,
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> array_to_string(t[i:i+2], ' '))
                ELSE CAST([] AS VARCHAR[]) END AS shingles
    FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS t
          FROM documents)
  ), ev AS (
    SELECT DISTINCT unnest(shingles) AS shingle FROM docs WHERE doc_id % 97 = 0
  ), tr AS (
    SELECT * FROM docs WHERE doc_id % 97 <> 0
  ), cont AS (
    SELECT DISTINCT doc_id
    FROM (SELECT doc_id, unnest(shingles) AS shingle FROM tr) s
    WHERE shingle IN (SELECT shingle FROM ev)
  )
  SELECT tr.lang,
         count(*) AS n_train,
         CAST(count(cont.doc_id) AS BIGINT) AS n_contaminated,
         CAST(count(*) - count(cont.doc_id) AS BIGINT) AS n_clean
  FROM tr LEFT JOIN cont ON tr.doc_id = cont.doc_id
  GROUP BY tr.lang
"""


@register(
    "q_decontaminate",
    oracle=_DECONTAMINATE_ORACLE,
    tags=("llm", "dedup", "decontamination"),
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop training documents that share
    any word 3-gram with a held-out eval set (here the deterministic
    doc_id % 97 == 0 slice stands in for the benchmark corpus) — the
    n-gram-overlap rule used to scrub eval contamination from
    pretraining data.

    Scale shape: eval shingles are tiny (benchmarks are KBs–MBs, the
    corpus is TBs), so they BROADCAST; the train side is a MAP-ONLY
    zip-slice shingling + broadcast left-semi join + distinct on
    doc_id — the corpus is never shuffled on shingle, only on doc_id
    (and only the contaminated slice at that). Shingles come from
    explode(arrays_zip(slice x3)) — pure whole-stage codegen. The
    two earlier forms both lose: transform(sequence, lambda) runs
    interpreted per element (BENCH.md's HOF rule), and the
    posexplode + lead()-window form (shipped until round 4) shuffles
    and sorts the entire token stream on doc_id just to look two
    tokens ahead — measured at the 100x corpus: 18.3 s (window) ->
    10.5 s (zip-slice), with the persist dropped too, since the
    map-only stream is cheaper to re-derive per branch than to
    cache. At real scale the shingle would be xxhash64'd to 8 bytes
    before the join; here the raw trigram string keeps the DuckDB
    oracle exact. Docs shorter than 3 tokens emit no shingles and
    fall through as clean (counts come from the documents table, not
    the shingle stream)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    sh = (
        d.filter(n >= 3)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(t, 1, n - 2), F.slice(t, 2, n - 2), F.slice(t, 3, n - 2)
                )
            ).alias("p"),
        )
        .select("doc_id", F.concat_ws(" ", "p.0", "p.1", "p.2").alias("shingle"))
    )
    ev = (
        sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    )
    cont = (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(ev), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(1))
    )
    tr = d.filter(F.col("doc_id") % 97 != 0).select("doc_id", "lang")
    return (
        tr.join(cont, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("is_cont").alias("n_contaminated"),
            (F.count(F.lit(1)) - F.count("is_cont")).alias("n_clean"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filter
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
  WITH tok AS (
    SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
  ), uni AS (
    SELECT doc_id, source, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct
    FROM tok
  ), bg AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i+1])) AS bigram
    FROM tok
  ), bgc AS (
    SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
  ), topbg AS (
    SELECT doc_id, max(c) AS top_bigram_n FROM bgc GROUP BY doc_id
  ), per AS (
    SELECT u.doc_id, u.source, u.n_tokens,
           CAST(1 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_frac,
           CAST(2 * top_bigram_n AS DOUBLE) / n_tokens AS top_bigram_frac
    FROM uni u JOIN topbg USING (doc_id)
  )
  SELECT source,
         count(*) AS n_docs,
         CAST(count(*) FILTER (dup_frac > CAST(0.6 AS DOUBLE)) AS BIGINT)
           AS n_dup_flagged,
         CAST(count(*) FILTER (top_bigram_frac > CAST(0.15 AS DOUBLE)) AS BIGINT)
           AS n_bigram_flagged,
         CAST(count(*) FILTER (dup_frac > CAST(0.6 AS DOUBLE)
                               OR top_bigram_frac > CAST(0.15 AS DOUBLE)) AS BIGINT)
           AS n_flagged,
         round(avg(dup_frac), 6) AS avg_dup_frac,
         round(avg(top_bigram_frac), 6) AS avg_top_bigram_frac
  FROM per
  GROUP BY source
"""


@register(
    "q_text_repetition",
    oracle=_REPETITION_ORACLE,
    tags=("llm", "text", "quality"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition filter: per document compute the
    duplicate-token fraction (1 - distinct/total) and the fraction of
    tokens covered by the single most frequent bigram, flag documents
    exceeding either threshold, report flag rates per source.

    Scale shape: ENTIRELY map-side until the final per-source
    aggregate. The duplicate fraction is array-local (no explode),
    and the top-bigram count is too: sort the bigram array and take
    the longest equal run (mode of a sorted multiset) with a single
    aggregate() pass — no (doc, bigram) explode, no shuffle, no join.
    The one shuffle in the whole query is the per-source rollup of
    per-doc rows. Flags compare IEEE-exact integer ratios, so the
    flag counts are deterministic; only the per-source averages are
    float merges, rounded to 6dp."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    tok = d.select("doc_id", "source", t.alias("t"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat_ws(" ", F.element_at("t", i), F.element_at("t", i + 1)),
    )
    # mode count of the bigram multiset = longest run in the sorted
    # array: fold with (prev, run, best) — per-element lambda over a
    # ~n_tokens array, strictly cheaper than shuffling (doc, bigram)
    top_bigram_n = F.aggregate(
        F.sort_array(bigrams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    per = tok.select(
        "doc_id",
        "source",
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        top_bigram_n.alias("top_bigram_n"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        (F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
            "dup_frac"
        ),
        (2 * F.col("top_bigram_n").cast("double") / F.col("n_tokens")).alias(
            "top_bigram_frac"
        ),
    )
    dup_flag = F.col("dup_frac") > 0.6
    bg_flag = F.col("top_bigram_frac") > 0.15
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(dup_flag).alias("n_dup_flagged"),
        F.count_if(bg_flag).alias("n_bigram_flagged"),
        F.count_if(dup_flag | bg_flag).alias("n_flagged"),
        F.round(F.avg("dup_frac"), 6).alias("avg_dup_frac"),
        F.round(F.avg("top_bigram_frac"), 6).alias("avg_top_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_PHONE_RE = "555-[0-9]{4}"

_PII_ORACLE = f"""
  WITH c AS (
    SELECT c_custkey,
           'contact ' || c_name || ' at ' || lower(c_mktsegment)
             || CAST(c_custkey AS VARCHAR) || '@example.com or call 555-'
             || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             || ' desk ' || CAST(c_nationkey AS VARCHAR) AS contact
    FROM customer
  )
  SELECT c_custkey,
         regexp_replace(regexp_replace(contact, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                        '{_PHONE_RE}', '[PHONE]', 'g') AS redacted,
         len(regexp_extract_all(contact, '{_EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(contact, '{_PHONE_RE}')) AS n_phones
  FROM c
"""


@register(
    "q_pii_redact",
    oracle=_PII_ORACLE,
    tags=("llm", "text", "pii"),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: regexp-mask email addresses and phone numbers in
    a contact string, counting redactions per row. The contact text is
    synthesized deterministically from customer fields (the testdata
    carries no real PII column); the operator itself — chained
    regexp_replace + regexp_extract_all counts — is exactly what a
    corpus scrubber runs per document.

    Scale shape: pure map-side (regexp inside whole-stage codegen),
    no shuffle at all; patterns stay in the RE2/Java common subset
    (character classes only, no backreferences, whole-match
    replacement) so Spark and DuckDB agree byte-for-byte."""
    c = load_table(spark, sf_dir, "customer")
    contact = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" at "),
        F.lower("c_mktsegment"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" desk "),
        F.col("c_nationkey").cast("string"),
    )
    base = c.select("c_custkey", contact.alias("contact"))
    return base.select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace("contact", _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
        ).alias("redacted"),
        F.size(F.regexp_extract_all("contact", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("contact", F.lit(_PHONE_RE), 0)).alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

_PACK_ORACLE = """
  WITH tok AS (
    SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens FROM documents
  ), cum AS (
    SELECT doc_id, lang, n_tokens,
           sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM tok
  ), binned AS (
    SELECT lang,
           CAST(floor((cum - n_tokens) / CAST(512 AS DOUBLE)) AS BIGINT) AS seq_id,
           doc_id, n_tokens
    FROM cum
  )
  SELECT lang, seq_id,
         count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
         min(doc_id) AS first_doc,
         max(doc_id) AS last_doc
  FROM binned
  GROUP BY lang, seq_id
"""


@register(
    "q_pack_sequences",
    oracle=_PACK_ORACLE,
    tags=("llm", "packing", "window"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training-batch construction: concatenate
    documents (per language, in doc_id order) and split the stream
    into 512-token sequences — each doc is assigned to the sequence
    where it STARTS (running-total // budget), the standard
    concat-then-split packing.

    Scale shape: one window cumsum per lang partition plus one small
    groupBy. A global per-lang running total is inherently sequential,
    so at 100 TB real packers run this per file-split (doc order
    within input split, not global doc_id) — same operator, coarser
    partition key; here the deterministic doc_id order is what makes
    the DuckDB oracle exact. Integer token counts throughout."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = tok.withColumn("cum", F.sum("n_tokens").over(w))
    binned = cum.select(
        "lang",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(512.0)).alias("seq_id"),
        "doc_id",
        "n_tokens",
    )
    return binned.groupBy("lang", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# RAG chunking with overlap
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = """
  WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
  ), starts AS (
    SELECT doc_id, t, unnest(range(1, len(t) + 1, 24)) AS s FROM tok
  )
  SELECT doc_id,
         CAST((s - 1) // 24 AS BIGINT) AS chunk_idx,
         array_to_string(t[s:s+31], ' ') AS chunk_text,
         len(t[s:s+31]) AS chunk_tokens
  FROM starts
"""


@register(
    "q_chunk_overlap",
    oracle=_CHUNK_ORACLE,
    tags=("llm", "text", "chunking"),
)
def chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking for retrieval indexing: split each
    document into 32-token chunks with stride 24 (8-token overlap),
    emitting one row per chunk with its text and true length (the
    final chunk is the clamped remainder).

    Scale shape: per-row array ops + one explode — embarrassingly
    parallel, no shuffle; output size is a fixed ~1.33x multiple of
    input tokens regardless of corpus size. Chunk windows come from an
    index sequence + slice (both engines clamp slices past the array
    end identically)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.split("text", " ").alias("t"))
    starts = tok.select(
        "doc_id", "t",
        F.explode(F.sequence(F.lit(1), F.size("t"), F.lit(24))).alias("s"),
    )
    return starts.select(
        "doc_id",
        F.floor((F.col("s") - 1) / 24).alias("chunk_idx"),
        F.array_join(F.slice("t", F.col("s"), F.lit(32)), " ").alias("chunk_text"),
        F.size(F.slice("t", F.col("s"), F.lit(32))).alias("chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# Hash-based mixture sampling
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"

_MIX_RATE_SQL = """
  CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 90
       WHEN source IN ('src5','src6','src7','src8','src9') THEN 60
       WHEN source IN ('src10','src11','src12','src13','src14') THEN 30
       ELSE 15 END
"""

_MIX_ORACLE = f"""
  WITH h AS (
    SELECT source, md5(text) AS hx, {_MIX_RATE_SQL} AS rate FROM documents
  ), b AS (
    SELECT source, rate,
           (strpos('{_HEX}', substr(hx, 1, 1)) - 1) * 16
             + strpos('{_HEX}', substr(hx, 2, 1)) - 1 AS bucket
    FROM h
  )
  SELECT source, rate,
         count(*) AS n_total,
         CAST(count(*) FILTER (bucket * 100 < rate * 256) AS BIGINT) AS n_sampled,
         round(CAST(count(*) FILTER (bucket * 100 < rate * 256) AS DOUBLE)
               / count(*), 4) AS achieved_rate
  FROM b
  GROUP BY source, rate
"""


@register(
    "q_mixture_sample",
    oracle=_MIX_ORACLE,
    tags=("llm", "sampling"),
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: keep each document with a per-source
    rate (90/60/30/15%) decided by a deterministic content hash — the
    reweighting step that turns raw crawl proportions into a training
    mixture. Hashing the CONTENT (not a row id) means duplicate texts
    get identical keep/drop decisions across sources.

    The hash bucket is the first two hex digits of md5 (uniform
    0..255, identical in both engines); keep iff bucket/256 <
    rate/100, compared in integer cross-multiplied form so no float
    enters the decision. At production scale the same rule would use
    xxhash64(text) % 2^16 — md5's first bytes keep the oracle exact
    here. Scale shape: map-only decision + one groupBy(source)."""
    d = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("source").isin("src0", "src1", "src2", "src3", "src4"), 90)
        .when(F.col("source").isin("src5", "src6", "src7", "src8", "src9"), 60)
        .when(F.col("source").isin("src10", "src11", "src12", "src13", "src14"), 30)
        .otherwise(15)
    )
    # instr('0123..f', digit) maps a hex digit to its value; expressed
    # via expr() because the haystack is the literal, not the column.
    b = d.select(
        "source",
        rate.alias("rate"),
        (
            (F.expr(f"instr('{_HEX}', substring(md5(cast(text as binary)), 1, 1))") - 1)
            * 16
            + F.expr(f"instr('{_HEX}', substring(md5(cast(text as binary)), 2, 1))")
            - 1
        ).alias("bucket"),
    )
    kept = F.col("bucket") * 100 < F.col("rate") * 256
    return b.groupBy("source", "rate").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(kept).alias("n_sampled"),
        F.round(F.count_if(kept).cast("double") / F.count(F.lit(1)), 4).alias(
            "achieved_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Gopher-style rule-based quality filtering (Rae et al. 2021 section
# A1.1 adapted to this corpus's signal ranges): the DECISION operator
# that turns q_text_quality's per-doc features into keep/drop rules
# with per-rule failure accounting — what a curation pipeline actually
# ships. Thresholds are integer-cross-multiplied so both engines
# compare exact integers, never floats.
# ---------------------------------------------------------------------------

_GOPHER_SW_SQL = ", ".join(f"'{w}'" for w in ("the", "a", "of", "to", "and", "in"))

_GOPHER_ORACLE = f"""
  WITH t AS (
    SELECT lang, source, n_chars, string_split(text, ' ') AS toks
    FROM documents
  ), m AS (
    SELECT lang, source, n_chars,
           len(toks) AS n_tok,
           len(list_distinct(toks)) AS n_dis,
           len(list_filter(list_distinct(toks),
                           w -> w IN ({_GOPHER_SW_SQL}))) AS n_stopw,
           list_max(list_transform(list_distinct(toks),
                    d -> len(list_filter(toks, x -> x = d)))) AS max_cnt
    FROM t
  ), r AS (
    SELECT lang, source,
           (n_tok < 20 OR n_tok > 90) AS f_len,
           (5 * n_tok > n_chars OR n_chars > 6 * n_tok) AS f_wordlen,
           (n_stopw < 2) AS f_stop,
           (10 * n_dis < 4 * n_tok) AS f_rep,
           (8 * max_cnt > n_tok) AS f_dom
    FROM m
  )
  SELECT lang, source,
         count(*) AS n_docs,
         CAST(count(*) FILTER (WHERE f_len) AS BIGINT) AS fail_length,
         CAST(count(*) FILTER (WHERE f_wordlen) AS BIGINT) AS fail_word_len,
         CAST(count(*) FILTER (WHERE f_stop) AS BIGINT) AS fail_stopword,
         CAST(count(*) FILTER (WHERE f_rep) AS BIGINT) AS fail_repetition,
         CAST(count(*) FILTER (WHERE f_dom) AS BIGINT) AS fail_dominance,
         CAST(count(*) FILTER (
           WHERE NOT (f_len OR f_wordlen OR f_stop OR f_rep OR f_dom)
         ) AS BIGINT) AS n_pass
  FROM r GROUP BY lang, source
"""


@register(
    "q_quality_gopher",
    oracle=_GOPHER_ORACLE,
    tags=("llm", "quality", "filter"),
)
def quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality gate with per-rule failure accounting, per
    (lang, source): token-count bounds [20, 90], mean-word-length
    bounds [5, 6] chars (integer cross-multiplied: 5*n_tok <= n_chars
    <= 6*n_tok), >= 2 distinct stopwords, type/token ratio >= 0.4
    (10*n_distinct >= 4*n_tok), and top-word dominance <= 1/8
    (8*max_count <= n_tok). Thresholds sit inside this corpus's signal
    ranges (median tokens 56, p10/p90 21/88; mean word length
    4.67-6.24; TTR 0.28-0.46; dominance 0.02-0.30) so every rule both
    passes and fails real documents.

    Scale shape: map-only per-doc rule evaluation (array HOFs over the
    token array — per doc O(distinct x len), vocabulary-bounded ~40x99
    here) followed by ONE shuffle on (lang, source). The dominance
    count deliberately stays an in-doc HOF rather than an
    explode + (doc, word) groupBy: the explode form shuffles
    corpus x tokens rows where the HOF form shuffles only the final
    (lang, source) aggregate. Four variants measured at 100x
    (BENCH.md r6 second wave): shipped HOF 5.81 s, explode+codegen
    5.58 s (local tie, but it ships the 28M-row token stream through
    an exchange — network on a real cluster — so the map-only form
    wins at scale), batch-dense Arrow kernel 9.6 s (rejected: text
    transfer + object factorize exceed the interpreted-HOF cost it
    removes), sorted-run aggregate HOF 6.41 s (same interpreter
    floor). All comparisons are integer, so the oracle hash is exact
    at any scale."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sw = F.array(*[F.lit(w) for w in ("the", "a", "of", "to", "and", "in")])
    dis = F.array_distinct("toks")
    m = d.select(
        "lang",
        "source",
        "n_chars",
        toks.alias("toks"),
    ).select(
        "lang",
        "source",
        "n_chars",
        F.size("toks").alias("n_tok"),
        F.size(dis).alias("n_dis"),
        F.size(F.filter(dis, lambda w: F.array_contains(sw, w))).alias("n_stopw"),
        F.array_max(
            F.transform(
                dis,
                lambda dd: F.size(F.filter("toks", lambda x: x == dd)),
            )
        ).alias("max_cnt"),
    )
    r = m.select(
        "lang",
        "source",
        ((F.col("n_tok") < 20) | (F.col("n_tok") > 90)).alias("f_len"),
        (
            (5 * F.col("n_tok") > F.col("n_chars"))
            | (F.col("n_chars") > 6 * F.col("n_tok"))
        ).alias("f_wordlen"),
        (F.col("n_stopw") < 2).alias("f_stop"),
        (10 * F.col("n_dis") < 4 * F.col("n_tok")).alias("f_rep"),
        (8 * F.col("max_cnt") > F.col("n_tok")).alias("f_dom"),
    )
    return r.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if("f_len").alias("fail_length"),
        F.count_if("f_wordlen").alias("fail_word_len"),
        F.count_if("f_stop").alias("fail_stopword"),
        F.count_if("f_rep").alias("fail_repetition"),
        F.count_if("f_dom").alias("fail_dominance"),
        F.count_if(
            ~(
                F.col("f_len")
                | F.col("f_wordlen")
                | F.col("f_stop")
                | F.col("f_rep")
                | F.col("f_dom")
            )
        ).alias("n_pass"),
    )


# ---------------------------------------------------------------------------
# Balanced shard export: assign every document to one of N output
# shards so shard token totals come out near-equal — the step that
# writes a curated corpus out for a data-parallel trainer. The naive
# exact form (global sort by size + ntile) is the single-reducer pinch
# q_customer_rfm just removed; this operator is the scale-safe
# formulation.
# ---------------------------------------------------------------------------

_N_SHARDS = 8
_SHARD_SALT = 64

_SHARD_ORACLE = f"""
  WITH t AS (
    SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
  ), s AS (
    SELECT doc_id, n_tok,
           (row_number() OVER (
              PARTITION BY n_tok, doc_id % {_SHARD_SALT}
              ORDER BY doc_id) - 1
            + n_tok + doc_id % {_SHARD_SALT}) % {_N_SHARDS} AS shard
    FROM t
  )
  SELECT CAST(shard AS INTEGER) AS shard_id,
         count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         CAST(min(doc_id) AS BIGINT) AS min_doc_id
  FROM s GROUP BY shard
"""


@register(
    "q_shard_balanced",
    oracle=_SHARD_ORACLE,
    tags=("llm", "export", "window"),
)
def shard_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced sharding: round-robin documents into
    8 shards WITHIN each (token-count, salt-bucket) group, with the
    round-robin START rotated by (n_tok + salt) % 8 so each group's
    remainder docs land on DIFFERENT shards — without the rotation
    every group's leftover goes to shard 0 and small corpora collapse
    into two shards (measured: the unrotated form emitted 2 non-empty
    shards at sf0.01). Output: per-shard doc count, token total, and
    min doc id (8 rows).

    Scale shape: the only window is PARTITIONED by
    (n_tok, doc_id % 64) — at 100 TB each size class splits
    across 64 salt buckets, so no partition concentrates a
    popular document length on one task (the residual skew a bare
    PARTITION BY n_tok would have). Balance bound: each group's
    rotated round-robin leaves at most 1 doc of that size per shard
    of imbalance, so absolute imbalance <= groups x max_doc_tokens —
    constant while shard size grows with the corpus (measured token
    imbalance: 33% of mean at sf0.01, 9.1% at sf0.1, vanishing at
    100x). Naive hash sharding measured worse at both SFs (42% / 9.0%)
    with no convergence guarantee; the exact-LPT alternative
    (row_number over a GLOBAL size sort) is ntile's single-reducer
    pinch (the q_customer_rfm lesson, BENCH.md r6) and was rejected
    unmeasured. Integer-only output; exact oracle."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    salt = F.pmod(F.col("doc_id"), F.lit(_SHARD_SALT))
    w = Window.partitionBy("n_tok", salt).orderBy("doc_id")
    s = t.select(
        "doc_id",
        "n_tok",
        (
            (F.row_number().over(w) - 1 + F.col("n_tok") + salt) % _N_SHARDS
        ).alias("shard"),
    )
    return s.groupBy(F.col("shard").cast("int").alias("shard_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )


# ---------------------------------------------------------------------------
# Token-budget mixture sampling: APPLY a temperature-weighted data
# recipe — "fill half the corpus's token budget, allocated across
# sources by the alpha=0.5 mixture rule" — selecting concrete
# documents deterministically. q_mixture_temperature computes the
# weights; this op spends them.
# ---------------------------------------------------------------------------

_BUDGET_ORACLE = """
  WITH d AS (
    SELECT doc_id, source, text,
           len(string_split(text, ' ')) AS n_tok
    FROM documents
  ), s AS (
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(round(sqrt(CAST(sum(n_tok) AS DOUBLE)) * 1e6) AS BIGINT)
             AS wmicro
    FROM d GROUP BY source
  ), g AS (
    SELECT CAST(sum(n_tokens) AS BIGINT) AS t2,
           CAST(sum(wmicro) AS BIGINT) AS sumw
    FROM s
  ), b AS (
    SELECT s.source, s.n_docs, s.n_tokens,
           (g.t2 * s.wmicro) // (2 * g.sumw) AS budget_tokens
    FROM s, g
  ), ranked AS (
    SELECT d.doc_id, d.source, d.n_tok,
           sum(d.n_tok) OVER (PARTITION BY d.source
                              ORDER BY md5(d.text), d.doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum
    FROM d
  )
  SELECT b.source,
         b.n_docs AS n_docs_total,
         b.n_tokens AS n_tokens_total,
         CAST(b.budget_tokens AS BIGINT) AS budget_tokens,
         CAST(count(*) FILTER (WHERE r.cum <= b.budget_tokens) AS BIGINT)
           AS n_docs_kept,
         CAST(coalesce(sum(r.n_tok) FILTER (WHERE r.cum <= b.budget_tokens), 0)
           AS BIGINT) AS tokens_kept
  FROM ranked r JOIN b ON b.source = r.source
  GROUP BY b.source, b.n_docs, b.n_tokens, b.budget_tokens
"""


@register(
    "q_mixture_budget",
    oracle=_BUDGET_ORACLE,
    tags=("llm", "mixture", "sampling"),
)
def mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend a token budget across sources by the alpha=0.5 mixture
    rule: global budget = half the corpus tokens, allocated to each
    source proportional to sqrt(source tokens) (q_mixture_temperature's
    integer micro-unit weights — round(sqrt(n_tokens)*1e6), BIGINT
    normalizer), then FILL each source's allocation with concrete
    documents in deterministic content-hash order (md5(text), doc_id
    tiebreak), keeping docs while the running token sum stays within
    budget. Output per source: totals, allocation, and what the
    recipe actually selected — the step that turns mixture weights
    into a training set manifest.

    Determinism: the only float is the proven wmicro quantization; the
    budget division is BIGINT floor ((t2 * wmicro) div (2 * sumw) —
    intermediates bounded ~3e16 at 100x, far under int64; at true
    100 TB rescale the micro-units), selection and all outputs are
    integer. Scale shape: two passes over documents (budgets must
    exist before selection — inherent to budget-filling), each ONE
    source-key exchange; the per-source running sum is a partitioned
    window (hash-ordered priority fill, the deterministic-sampling
    idiom from q_sample_hash_deterministic), the 20-row budget table
    broadcasts back, and the final per-source aggregate rides the
    window's partitioning."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "text",
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.round(F.sqrt(F.sum("n_tok").cast("double")) * 1e6)
        .cast("long")
        .alias("wmicro"),
    )
    g = s.agg(
        F.sum("n_tokens").alias("t2"), F.sum("wmicro").alias("sumw")
    )
    b = s.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("(t2 * wmicro) div (2 * sumw)").alias("budget_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("text").cast("binary")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = d.select("source", "n_tok", F.sum("n_tok").over(w).alias("cum"))
    kept = F.col("cum") <= F.col("budget_tokens")
    return (
        ranked.join(F.broadcast(b), "source")
        .groupBy("source", "n_docs", "n_tokens", "budget_tokens")
        .agg(
            F.count_if(kept).alias("n_docs_kept"),
            F.coalesce(
                F.sum(F.when(kept, F.col("n_tok"))), F.lit(0)
            ).alias("tokens_kept"),
        )
        .select(
            "source",
            F.col("n_docs").alias("n_docs_total"),
            F.col("n_tokens").alias("n_tokens_total"),
            "budget_tokens",
            "n_docs_kept",
            "tokens_kept",
        )
    )


# ---------------------------------------------------------------------------
# Length-bucketed batch assignment
# ---------------------------------------------------------------------------

_BATCH_SIZE = 32
_LEN_BOUNDS = (64, 128, 256, 512)  # CASE ladder: integer-exact in both engines

_LEN_BUCKET_SQL = (
    "CASE "
    + " ".join(
        f"WHEN n_chars < {b} THEN {i}" for i, b in enumerate(_LEN_BOUNDS)
    )
    + f" ELSE {len(_LEN_BOUNDS)} END"
)

_BATCH_ORACLE = f"""
  WITH keyed AS (
    SELECT doc_id, n_chars,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS BIGINT)
             AS shard,
           {_LEN_BUCKET_SQL} AS len_bucket,
           md5(CAST(doc_id AS VARCHAR)) AS ord_key
    FROM documents
  ), numbered AS (
    SELECT shard, len_bucket, n_chars,
           row_number() OVER (PARTITION BY shard, len_bucket
                              ORDER BY ord_key, doc_id) AS rn
    FROM keyed
  )
  SELECT shard, len_bucket,
         CAST((rn - 1) // {_BATCH_SIZE} AS BIGINT) AS batch_id,
         count(*) AS n_docs,
         max(n_chars) AS max_chars,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         round(1.0 - CAST(sum(n_chars) AS DOUBLE)
                     / (count(*) * max(n_chars)), 6) AS pad_waste
  FROM numbered
  GROUP BY shard, len_bucket, CAST((rn - 1) // {_BATCH_SIZE} AS BIGINT)
"""


@register(
    "q_batch_by_length",
    oracle=_BATCH_ORACLE,
    tags=("llm", "batching", "window"),
)
def batch_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed training-batch assignment: group documents into
    dyadic length buckets (<64, <128, <256, <512, rest chars), shuffle
    each bucket into deterministic content-hash order, and cut batches
    of 32 — the padding-minimizing batching every training data loader
    runs (batching unsorted docs pads every sequence to the batch max;
    bucketing first bounds the waste to the bucket's spread). Emits
    per-batch padding accounting (pad_waste = 1 - sum/(n*max)), the
    number a pipeline monitors to tune its bucket boundaries.

    Scale shape: batches are SHARD-LOCAL — the window partitions by
    (shard, len_bucket) with shard = 4 md5 bits of the doc id, so no
    bucket ever serializes through one reducer (the q_pack_sequences
    per-split lesson, mechanized: 16 shards x 5 buckets = 80
    independent window groups, and a real deployment uses input-split
    ids for free ordering). ONE exchange total: the downstream
    per-batch aggregate's keys are a superset of the window keys, so
    it rides the same hash partitioning (plan-tested). The md5 order
    key is a lexicographic string compare, exact in both engines; the
    CASE bucket ladder is integer-exact; pad_waste is one correctly-
    rounded division after integer aggregates."""
    d = load_table(spark, sf_dir, "documents")
    md5s = F.md5(F.col("doc_id").cast("string").cast("binary"))
    bucket = F.lit(len(_LEN_BOUNDS))
    for i, b in reversed(list(enumerate(_LEN_BOUNDS))):
        bucket = F.when(F.col("n_chars") < b, F.lit(i)).otherwise(bucket)
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.conv(F.substring(md5s, 1, 1), 16, 10).cast("bigint").alias("shard"),
        bucket.alias("len_bucket"),
        md5s.alias("ord_key"),
    )
    w = Window.partitionBy("shard", "len_bucket").orderBy("ord_key", "doc_id")
    numbered = keyed.withColumn("rn", F.row_number().over(w))
    batch_id = F.floor((F.col("rn") - 1) / F.lit(_BATCH_SIZE))
    return (
        numbered.withColumn("batch_id", batch_id)
        .groupBy("shard", "len_bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(
                1.0
                - F.sum("n_chars").cast("double")
                / (F.count(F.lit(1)) * F.max("n_chars")),
                6,
            ).alias("pad_waste"),
        )
    )


# ---------------------------------------------------------------------------
# q_curriculum_stages: difficulty-quartile curriculum assignment
# ---------------------------------------------------------------------------

_CURRICULUM_ORACLE = """
  WITH per_doc AS (
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           len(list_distinct(string_split(text, ' '))) * 1000000
             + len(string_split(text, ' ')) AS difficulty
    FROM documents
  ), b AS (
    SELECT quantile_cont(difficulty, 0.25) AS d25,
           quantile_cont(difficulty, 0.50) AS d50,
           quantile_cont(difficulty, 0.75) AS d75
    FROM per_doc
  )
  SELECT CAST(1 + CAST(difficulty > d25 AS INT)
                + CAST(difficulty > d50 AS INT)
                + CAST(difficulty > d75 AS INT) AS INT) AS stage,
         count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
         CAST(min(difficulty) AS BIGINT) AS min_difficulty,
         CAST(max(difficulty) AS BIGINT) AS max_difficulty
  FROM per_doc, b
  GROUP BY 1
"""


@register(
    "q_curriculum_stages",
    oracle=_CURRICULUM_ORACLE,
    tags=("llm", "curriculum", "filter"),
)
def curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning stage assignment: score every document's
    difficulty as (lexical richness, length) packed richness-major
    into one BIGINT (distinct-token count * 1e6 + token count — more
    vocabulary and longer text = harder), cut the corpus into
    difficulty quartiles, and report per-stage document and token
    mass — the ordering a curriculum schedule trains through
    (stage 1 = easiest first).

    Scale discipline is q_customer_rfm's boundary broadcast: the three
    quartile cuts are ONE tiny aggregate broadcast back, stages
    assigned map-side — no global sort, no Window node (plan-tested;
    ntile would be the single-reducer pinch the r5 verdict retired).
    Difficulty is computed with JVM array expressions (size/
    array_distinct/split), never an explode — the per-doc pass stays
    map-only. Quartiles of integers interpolate at dyadic factors
    (exactly-representable doubles), so every boundary comparison is
    exact in both engines — the q_outlier_iqr rule."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    per_doc = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("long") * 1_000_000
            + F.size(toks).cast("long")
        ).alias("difficulty"),
    )
    b = per_doc.agg(
        F.percentile("difficulty", F.lit(0.25)).alias("d25"),
        F.percentile("difficulty", F.lit(0.50)).alias("d50"),
        F.percentile("difficulty", F.lit(0.75)).alias("d75"),
    )
    staged = per_doc.crossJoin(F.broadcast(b)).select(
        "n_tokens",
        "difficulty",
        (
            F.lit(1)
            + (F.col("difficulty") > F.col("d25")).cast("int")
            + (F.col("difficulty") > F.col("d50")).cast("int")
            + (F.col("difficulty") > F.col("d75")).cast("int")
        ).alias("stage"),
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens_total"),
        F.min("difficulty").alias("min_difficulty"),
        F.max("difficulty").alias("max_difficulty"),
    )


# ---------------------------------------------------------------------------
# q_epoch_shuffle: deterministic per-epoch training order
# ---------------------------------------------------------------------------

_N_EPOCHS = 3
_EPOCH_SHARDS = 8

_EPOCH_SHUFFLE_ORACLE = f"""
  WITH epochs AS (
    SELECT unnest(range({_N_EPOCHS})) AS epoch
  ), keyed AS (
    SELECT e.epoch, d.doc_id,
           md5('ep:' || CAST(e.epoch AS VARCHAR) || ':'
               || CAST(d.doc_id AS VARCHAR)) AS h
    FROM documents d CROSS JOIN epochs e
  ), sharded AS (
    SELECT epoch, doc_id, h,
           CAST('0x' || substr(h, 1, 12) AS BIGINT) % {_EPOCH_SHARDS} AS shard
    FROM keyed
  )
  SELECT CAST(epoch AS BIGINT) AS epoch,
         CAST(shard AS BIGINT) AS shard,
         CAST(row_number() OVER (PARTITION BY epoch, shard
                                 ORDER BY h, doc_id) AS BIGINT) AS position,
         doc_id
  FROM sharded
"""


@register(
    "q_epoch_shuffle",
    oracle=_EPOCH_SHUFFLE_ORACLE,
    tags=("llm", "shuffle", "deterministic", "epoch"),
)
def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-epoch training order: every epoch gets its
    OWN pseudorandom permutation of the corpus (hash of epoch||doc_id
    — content-addressed, so a resumed or backfilled job reproduces the
    exact order; rand() would reshuffle on every retry), documents
    land in 8 reader shards by hash prefix, and the within-shard
    position is the rank of the hash — the (epoch, shard, position)
    triple a training loader consumes. Same-document positions are
    independent across epochs, which is the point of re-shuffling per
    epoch.

    Scale shape: the epoch fanout is a map-side explode (x n_epochs,
    bounded small), ONE exchange keyed (epoch, shard) — which is the
    loader's read unit, so the shuffle that orders the data is the
    shuffle that ships it — and Spark 4 plans the rank as
    WindowGroupLimit-free full ordering per shard (positions must be
    dense, so this is the honest per-shard sort; shards bound the
    sort width at corpus/8 per epoch). At 100 TB: raise _EPOCH_SHARDS to
    the loader's file-group count; the per-shard sort stays the
    write-side sort every shuffle-write pays anyway."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_N_EPOCHS - 1))).alias("epoch"),
    ).select(
        F.col("epoch").cast("long").alias("epoch"),
        "doc_id",
        F.md5(
            F.concat(
                F.lit("ep:"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            ).cast("binary")
        ).alias("h"),
    )
    sharded = keyed.select(
        "epoch",
        "doc_id",
        "h",
        (F.conv(F.substring("h", 1, 12), 16, 10).cast("bigint") % _EPOCH_SHARDS)
        .cast("long")
        .alias("shard"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    return sharded.select(
        "epoch",
        "shard",
        F.row_number().over(w).cast("long").alias("position"),
        "doc_id",
    )
