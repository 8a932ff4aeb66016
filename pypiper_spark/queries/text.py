"""Text analysis for LLM-data pipelines (SURVEY.md 2B north-star ops):
tokenization, TF-IDF, corpus stats, quality scoring, language-ID
heuristic, token counting, document fingerprinting.

All pure built-in functions (split/explode/higher-order/agg) — these
run inside whole-stage codegen; there is no Python in this module.
Scale: every query is scan -> narrow ops -> ONE shuffle (the groupBy),
so they parallelize trivially over a 100 TB documents table.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pypiper_spark.catalog import load_table
from pypiper_spark.compare import davg, dsum, sql_davg, sql_dsum
from pypiper_spark.registry import register


@register(
    "q_text_tokenize",
    oracle="""
      SELECT word,
             count(*) AS n_occurrences,
             count(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
      HAVING count(*) >= 5
    """,
    tags=("text",),
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies: tokenize -> explode -> count."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= 5)
    )


_TFIDF_ORACLE = """
  WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  ), tf AS (
    SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word
  ), df AS (
    SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY word
  ), n AS (
    SELECT count(*) AS n_docs FROM documents
  ), scored AS (
    SELECT tf.doc_id, tf.word, tf.tf, df.df,
           round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 8) AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n
  )
  SELECT doc_id, word, tf, df, tfidf FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, word) AS rn
    FROM scored
  ) WHERE rn <= 5
"""


@register("q_text_tfidf", oracle=_TFIDF_ORACLE, tags=("text", "tfidf"))
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF, top-5 terms per document.

    Plan shape: tokenize ONCE into tf; df is derived from tf (tf
    already holds one row per (doc, word), so df = count per word).
    tf is PERSISTED because its two consumers aggregate on different
    keys ((doc,word) vs word) — the exchanges don't match, so without
    the persist Catalyst re-runs the scan+explode+agg subtree for
    each (verified in the physical plan: two Generate nodes). tf is
    the distinct (doc, word) table — bounded by corpus token mass,
    the normal cached intermediate of every tf-idf job. tfidf rounds
    to 8 decimals BEFORE ranking so the per-doc order is identical on
    both engines (ln may differ in the last bit between libms)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = (
        tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
        .persist()  # lifetime: session.release_query_caches policy
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    # corpus size as a broadcast 1-row aggregate (no driver-side action:
    # the whole query stays one job, mirroring the oracle's CROSS JOIN n)
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        # df is vocab-cardinality (sublinear in corpus size but
        # unbounded — web-scale corpora reach billions of distinct
        # tokens), so no hard broadcast hint: AQE broadcasts it while
        # small, shuffle-joins on word beyond 64 MB. n is one row —
        # its broadcast is bounded by construction.
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 8
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "word", "tf", "df", "tfidf")
    )


@register(
    "q_text_lang_stats",
    oracle=f"""
      SELECT lang, source,
             count(*) AS n_docs,
             {sql_dsum('n_chars')} AS total_chars,
             {sql_davg('n_chars')} AS avg_chars,
             min(n_chars) AS min_chars,
             max(n_chars) AS max_chars
      FROM documents
      GROUP BY lang, source
    """,
    tags=("text", "aggregate"),
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) document stats: counts and char-length distribution."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        dsum("n_chars").alias("total_chars"),
        davg("n_chars").alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


_STOPWORDS = ("the", "a", "of", "to", "and", "in")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

_QUALITY_ORACLE = f"""
  WITH t AS (
    SELECT doc_id, lang, n_chars,
           string_split(text, ' ') AS tokens
    FROM documents
  )
  SELECT doc_id, lang,
         CAST(len(tokens) AS INTEGER) AS n_tokens,
         CAST(len(list_distinct(tokens)) AS INTEGER) AS n_distinct,
         round(CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens), 6)
           AS distinct_ratio,
         round(CAST(len(list_filter(tokens, t -> t IN ({_SW_SQL}))) AS DOUBLE)
               / len(tokens), 6) AS stopword_ratio,
         round(CAST(n_chars AS DOUBLE) / len(tokens), 6) AS avg_token_len
  FROM t
"""


@register("q_text_quality", oracle=_QUALITY_ORACLE, tags=("text", "quality"))
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals (distinct ratio, stopword ratio,
    token length) — the standard pre-training filter features."""
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    t = d.select("doc_id", "lang", "n_chars", tokens.alias("tokens"))
    n_tok = F.size("tokens")
    n_distinct = F.size(F.array_distinct("tokens"))
    n_stop = F.size(F.filter("tokens", lambda x: F.array_contains(sw, x)))
    return t.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.round(n_distinct.cast("double") / n_tok, 6).alias("distinct_ratio"),
        F.round(n_stop.cast("double") / n_tok, 6).alias("stopword_ratio"),
        F.round(F.col("n_chars").cast("double") / n_tok, 6).alias("avg_token_len"),
    )


_EN_MARKERS = ("the", "a", "of", "and", "data", "query")
_DE_MARKERS = ("der", "die", "das", "und", "nicht", "mit")
_FR_MARKERS = ("le", "la", "les", "et", "des", "une")


def _marker_sql(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in markers)
    return f"CAST(len(list_filter(tokens, t -> t IN ({lst}))) AS INTEGER)"


_LANGID_ORACLE = f"""
  WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tokens FROM documents)
  SELECT doc_id, lang, en_hits, de_hits, fr_hits,
         CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
              WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
              WHEN fr_hits > 0 THEN 'fr'
              ELSE 'unknown' END AS predicted_lang
  FROM (
    SELECT doc_id, lang,
           {_marker_sql(_EN_MARKERS)} AS en_hits,
           {_marker_sql(_DE_MARKERS)} AS de_hits,
           {_marker_sql(_FR_MARKERS)} AS fr_hits
    FROM t
  )
"""


@register("q_text_langid", oracle=_LANGID_ORACLE, tags=("text", "langid"))
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-hit language ID heuristic (n-gram-style scoring with a
    per-language marker list; argmax with deterministic tie-break)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.split("text", " ").alias("tokens"))

    def hits(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(w) for w in markers])
        return F.size(F.filter("tokens", lambda x: F.array_contains(arr, x)))

    scored = t.select(
        "doc_id",
        "lang",
        hits(_EN_MARKERS).alias("en_hits"),
        hits(_DE_MARKERS).alias("de_hits"),
        hits(_FR_MARKERS).alias("fr_hits"),
    )
    return scored.withColumn(
        "predicted_lang",
        F.when(
            (F.col("en_hits") >= F.col("de_hits"))
            & (F.col("en_hits") >= F.col("fr_hits"))
            & (F.col("en_hits") > 0),
            "en",
        )
        .when((F.col("de_hits") >= F.col("fr_hits")) & (F.col("de_hits") > 0), "de")
        .when(F.col("fr_hits") > 0, "fr")
        .otherwise("unknown"),
    )


@register(
    "q_text_token_count",
    oracle="""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+')) AS INTEGER)
               AS re_tokens,
             CAST(length(text) AS INTEGER) AS n_chars_text,
             CAST(ceil(length(text) / 4.0) AS INTEGER) AS est_bpe_tokens
      FROM documents
    """,
    tags=("text", "tokens"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, regex word classes
    (BPE-ish pre-tokenizer), and the chars/4 estimate."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-zA-Z]+|[0-9]+"), 0)).alias("re_tokens"),
        F.length("text").cast("int").alias("n_chars_text"),
        F.ceil(F.length("text") / 4.0).cast("int").alias("est_bpe_tokens"),
    )


_FP_ORACLE = """
  WITH tok AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
    FROM documents
  ), poly AS (
    SELECT doc_id,
           CAST(sum(pos * length(word) * 31) AS BIGINT) AS poly_hash
    FROM tok GROUP BY doc_id
  )
  SELECT d.doc_id,
         md5(d.text) AS md5_full,
         md5(array_to_string(list_sort(list_distinct(string_split(d.text, ' '))), ' '))
           AS md5_canonical,
         p.poly_hash
  FROM documents d JOIN poly p USING (doc_id)
"""


@register("q_text_fingerprint", oracle=_FP_ORACLE, tags=("text", "fingerprint"))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact (md5), canonical bag-of-words md5
    (order-insensitive near-dup key), and a positional polynomial hash
    (exact integer arithmetic — rolling-hash style)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    )
    poly = tok.groupBy("doc_id").agg(
        F.sum((F.col("pos0") + 1) * F.length("word") * 31).alias("poly_hash")
    )
    canon = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " ")))).cast("binary")
    )
    return (
        d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("md5_full"), canon.alias("md5_canonical"))
        .join(poly, "doc_id")
        .select("doc_id", "md5_full", "md5_canonical", "poly_hash")
    )


_BIGRAM_ORACLE = """
  WITH toks AS (SELECT lang, string_split(text, ' ') AS t FROM documents),
  bg AS (SELECT lang,
                unnest(list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i+1])) AS bigram
         FROM toks WHERE len(t) > 1),
  cnt AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY lang, bigram)
  SELECT lang, bigram, n, rnk FROM (
    SELECT lang, bigram, n,
           row_number() OVER (PARTITION BY lang
                              ORDER BY n DESC, bigram) AS rnk
    FROM cnt) WHERE rnk <= 5
"""


@register("q_text_bigrams", oracle=_BIGRAM_ORACLE, tags=("text", "ngram"))
def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 bigrams per language: adjacent-token pairs built with a
    higher-order transform over index sequences (no self-join, no
    UDF — the n-gram shingle primitive MinHash builds on, kept
    entirely in codegen), then count + per-lang windowed top-k.
    Rank ties break on the bigram string so the cut is deterministic."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    pairs = F.when(
        F.size(t) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    )
    bg = d.select("lang", F.explode(pairs).alias("bigram"))
    cnt = bg.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        cnt.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "bigram", "n", "rnk")
    )


@register(
    "q_text_boilerplate",
    oracle="""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
      ),
      grams AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
        FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
        WHERE len(t) >= 8
      ),
      freq AS (
        SELECT g, count(*) AS n_docs FROM grams GROUP BY g
      )
      SELECT grams.doc_id,
             count(*) AS n_grams,
             CAST(sum(CASE WHEN freq.n_docs >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler,
             CAST(sum(CASE WHEN freq.n_docs >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS boiler_frac
      FROM grams JOIN freq USING (g)
      GROUP BY grams.doc_id
    """,
    tags=("text", "llm", "boilerplate"),
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: per document, the
    fraction of its distinct 8-grams that appear in >= 3 distinct
    documents. The corpus-level twin of q_text_repetition (which is
    within-document Gopher rules): CCNet/RefinedWeb pipelines use
    exactly this signal to strip shared headers/footers/templates
    before training.

    Scale shape: tokens explode to position-sliced 8-grams entirely
    in codegen (sequence + slice + array_join, no UDF), collapse to
    DISTINCT (doc, gram) — the working set is bounded by corpus token
    count — then the document frequency is a WINDOW COUNT over the
    gram partition, not a groupBy+self-join: the DF table here is
    corpus-cardinality BY CONSTRUCTION, and every join strategy for
    the join-back form fails some way at scale (measured at the 100x
    corpus, 75 M distinct grams: Catalyst's static estimate
    undershoots the wide string keys and chose broadcast -> driver
    OOM, the same data-scaled-broadcast class the round-4 de-hinting
    removed elsewhere; a pinned SHUFFLE_HASH then exhausted its
    per-partition build maps; pinned sort-merge worked at 75 s).
    The window form shuffles the gram stream ONCE on the gram key
    and counts each group in place — no second table, no join, and
    per-group state is tiny (grams repeat across at most
    n_docs documents). Measured at 100x: 75 s (sort-merge join-back)
    -> 22.5 s, BELOW the DuckDB twin's 26 s. At 100 TB, partition on xxhash64(gram) instead of the
    string to cut shuffle width ~10x (collision odds ~n^2/2^64,
    negligible); the string key is kept here only so the DuckDB
    oracle can reproduce values bit-for-bit. boiler_frac is one IEEE
    division of two exact BIGINTs — deterministic without rounding
    discipline."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    grams = (
        d.filter(F.size("t") >= 8)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("t") - 7)).alias("i"),
            "t",
        )
        .select("doc_id", F.array_join(F.slice("t", F.col("i"), 8), " ").alias("g"))
        .distinct()
    )
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("g"))
    boiler = F.sum((F.col("n_docs") >= 3).cast("long"))
    return (
        grams.withColumn("n_docs", n_docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            boiler.alias("n_boiler"),
            (boiler.cast("double") / F.count(F.lit(1))).alias("boiler_frac"),
        )
    )


_ENTROPY_ORACLE = """
  WITH chars AS (
    SELECT doc_id, lang, unnest(string_split(text, '')) AS ch
    FROM documents
  ),
  counts AS (
    SELECT doc_id, lang, ch, count(*) AS c
    FROM chars GROUP BY doc_id, lang, ch
  ),
  ent AS (
    SELECT doc_id, lang,
           round(ln(CAST(sum(c) AS DOUBLE))
                 - sum(c * ln(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE),
                 6) AS h
    FROM counts GROUP BY doc_id, lang
  )
  SELECT lang,
         count(*) AS n_docs,
         round(avg(h), 6) AS avg_entropy,
         round(min(h), 6) AS min_entropy,
         round(max(h), 6) AS max_entropy
  FROM ent GROUP BY lang
"""


@register("q_text_entropy", oracle=_ENTROPY_ORACLE, tags=("text", "quality"))
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document, summarized per
    language — the cheap randomness score that separates natural text
    (~4.1 nats for English chars) from base64 blobs (~4.8, near-flat)
    and template spam (low): a standard corpus-hygiene signal next to
    q_text_repetition.

    Numeric discipline: H = ln(N) - sum(c*ln c)/N over EXACT integer
    char counts, so the only float is the final ln-fold; per-doc H
    rounds at 6dp (error floor ~1e-11 for <=96 distinct chars) BEFORE
    the per-lang aggregate, which rounds again (compare.py rule:
    round before anything order-dependent consumes the value).

    Scale shape (r6 rewrite, ONE exchange): the r5 form exploded to
    char grain — ~200x corpus multiplication through the (doc, char)
    shuffle, 7.2 s vs the twin's 1.3 s at 100x. Two JVM-only rewrites
    were measured and REJECTED at the 100x corpus before this one:
    replace-per-distinct-char transform (O(len x alphabet) string
    passes, 10.7 s) and a sorted-run aggregate() fold (15.8 s — Spark
    evaluates higher-order lambdas INTERPRETED per element, so the
    per-char fold loses to the codegen'd explode it replaced). The
    shipped form is the standing batched-kernel rule from BENCH.md:
    one Arrow-batched pandas UDF that builds (doc, codepoint) keys for
    the WHOLE batch (utf-32 decode, exact unicode codepoints) and runs
    a single np.unique + bincount — per-doc histograms in one C sort,
    zero per-row Python. The only shuffle is the final per-lang
    rollup (plan-tested: no Generate, one exchange). Rounding at 6dp
    (JVM F.round, same HALF_UP as the oracle) absorbs summation-order
    noise, the same argument as before."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _char_entropy(texts: pd.Series) -> pd.Series:
        # Batch-dense histogram: one bincount over doc*(cpmax+1)+cp
        # when the (docs x alphabet-span) matrix fits (~ASCII corpora —
        # cpmax 121 here), else compress codepoints with np.unique
        # first. Measured at the 100x corpus: 5.4 s single-thread for
        # 253M chars vs 55 s for the 64-bit-key np.unique variant and
        # 29 s for the LUT variant (the astype/repeat int64 copies
        # dominated both).
        lens = texts.str.len().to_numpy(dtype=np.int32)
        joined = "".join(texts.tolist())
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        n = len(texts)
        if n == 0:
            return pd.Series([], dtype=np.float64)
        cpmax = int(cp.max()) if cp.size else 0
        doc = np.repeat(np.arange(n, dtype=np.int64), lens)
        if n * (cpmax + 1) <= (1 << 26):
            M = np.bincount(
                doc * (cpmax + 1) + cp, minlength=n * (cpmax + 1)
            ).reshape(n, cpmax + 1)
        else:
            uk, inv = np.unique(cp, return_inverse=True)
            K = uk.size
            M = np.bincount(doc * K + inv, minlength=n * K).reshape(n, K)
        Mf = M.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(M > 0, Mf * np.log(Mf), 0.0).sum(axis=1)
        nf = lens.astype(np.float64)
        return pd.Series(np.log(nf) - s / nf)

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    ent = d.select("lang", F.round(_char_entropy("text"), 6).alias("h"))
    return ent.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("h"), 6).alias("avg_entropy"),
        F.round(F.min("h"), 6).alias("min_entropy"),
        F.round(F.max("h"), 6).alias("max_entropy"),
    )


_TRIGRAM_ORACLE = """
  WITH toks AS (
    SELECT lang, string_split(text, ' ') AS t FROM documents
  ),
  tri AS (
    SELECT lang, array_to_string(t[i:i+2], ' ') AS trigram
    FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    WHERE len(t) >= 3
  ),
  cnt AS (
    SELECT lang, trigram, count(*) AS n FROM tri GROUP BY lang, trigram
  )
  SELECT lang, trigram, n, rnk FROM (
    SELECT lang, trigram, n,
           row_number() OVER (PARTITION BY lang ORDER BY n DESC, trigram) AS rnk
    FROM cnt
  ) WHERE rnk <= 3
"""


@register("q_text_trigrams", oracle=_TRIGRAM_ORACLE, tags=("text", "ngram"))
def text_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 word trigrams per language — the n=3 rung of the shingle
    ladder (bigrams: q_text_bigrams; 7-grams: q_text_boilerplate),
    kept because trigram tables are what language-ID and contamination
    screens actually consume.

    Shingles are built with the zip-slice idiom (arrays_zip of three
    shifted slices — whole-stage codegen) rather than an index
    transform: the interpreted-HOF form measured 5x slower at the
    100x corpus when q_lm_perplexity made the same choice (BENCH.md
    r4). One count shuffle on (lang, trigram), then a per-lang top-k
    window with a full deterministic tiebreak."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    tri = (
        d.filter(F.size(t) >= 3)
        .select(
            "lang",
            F.explode(
                F.arrays_zip(
                    F.slice(t, 1, F.size(t) - 2),
                    F.slice(t, 2, F.size(t) - 2),
                    F.slice(t, 3, F.size(t) - 2),
                )
            ).alias("p"),
        )
        .select(
            "lang",
            F.concat_ws(
                " ", F.col("p.0"), F.col("p.1"), F.col("p.2")
            ).alias("trigram"),
        )
    )
    cnt = tri.groupBy("lang", "trigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("trigram"))
    return (
        cnt.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("lang", "trigram", "n", "rnk")
    )


_PMI_ORACLE = """
  WITH toks AS (
    SELECT lang, string_split(text, ' ') AS t FROM documents
  ),
  bg AS (
    SELECT lang, t[i] AS w1, t[i+1] AS w2
    FROM toks, UNNEST(range(1, len(t))) AS u(i)
    WHERE len(t) >= 2
  ),
  c12 AS (SELECT lang, w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2, 3),
  c1 AS (SELECT lang, w1, count(*) AS n1 FROM bg GROUP BY 1, 2),
  c2 AS (SELECT lang, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
  n AS (SELECT lang, count(*) AS nn FROM bg GROUP BY 1),
  scored AS (
    SELECT c12.lang, c12.w1, c12.w2, n12,
           round(ln(CAST(n12 AS DOUBLE) * nn / (CAST(n1 AS DOUBLE) * n2)), 6)
             AS pmi
    FROM c12
    JOIN c1 ON c1.lang = c12.lang AND c1.w1 = c12.w1
    JOIN c2 ON c2.lang = c12.lang AND c2.w2 = c12.w2
    JOIN n ON n.lang = c12.lang
    WHERE n12 >= 5
  )
  SELECT lang, w1, w2, n12, pmi, rnk FROM (
    SELECT *, row_number() OVER (PARTITION BY lang
                                 ORDER BY pmi DESC, w1, w2) AS rnk
    FROM scored
  ) WHERE rnk <= 5
"""


@register("q_text_pmi", oracle=_PMI_ORACLE, tags=("text", "ngram", "scoring"))
def text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 collocations per language by pointwise mutual information
    over adjacent bigrams (PMI = ln(c12*N / (c1*c2)), min support 5) —
    the statistic phrase-mining and tokenizer-merge pipelines rank
    candidate merges with.

    Numeric discipline: every count is exact; PMI is ONE ln per row
    over a ratio of exact integers (no float accumulation), rounded at
    6dp BEFORE ranking so a last-bit libm difference between engines
    cannot reorder the top-k; ties break on the word pair. Scale
    shape: bigrams via the zip-slice idiom (codegen); three aggregates
    on (lang, w1[, w2]) keys — the w1/w2 marginals are
    vocab-cardinality, broadcast back onto the pair counts by AQE; the
    lang total is a tiny broadcast."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    bg = (
        d.filter(F.size(t) >= 2)
        .select(
            "lang",
            F.explode(
                F.arrays_zip(
                    F.slice(t, 1, F.size(t) - 1), F.slice(t, 2, F.size(t) - 1)
                )
            ).alias("p"),
        )
        .select("lang", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    )
    c12 = bg.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = bg.groupBy("lang", "w1").agg(F.count(F.lit(1)).alias("n1"))
    c2 = bg.groupBy("lang", "w2").agg(F.count(F.lit(1)).alias("n2"))
    n = bg.groupBy("lang").agg(F.count(F.lit(1)).alias("nn"))
    scored = (
        c12.filter(F.col("n12") >= 5)
        .join(c1, ["lang", "w1"])
        .join(c2, ["lang", "w2"])
        .join(F.broadcast(n), "lang")
        .select(
            "lang",
            "w1",
            "w2",
            "n12",
            F.round(
                F.log(
                    F.col("n12").cast("double")
                    * F.col("nn")
                    / (F.col("n1").cast("double") * F.col("n2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("pmi"), "w1", "w2")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "w1", "w2", "n12", "pmi", "rnk")
    )


_BM25_TERMS = ("scan", "merge", "window")
_BM25_K1, _BM25_B = 1.2, 0.75

_BM25_ORACLE = f"""
  WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  ),
  dl AS (
    SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
  ),
  corpus AS (
    SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
  ),
  tf AS (
    SELECT doc_id, word, count(*) AS tf FROM tok
    WHERE word IN {_BM25_TERMS} GROUP BY doc_id, word
  ),
  df AS (
    SELECT word, count(*) AS df FROM tf GROUP BY word
  ),
  scored AS (
    SELECT tf.doc_id,
           round(sum(
             ln((c.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * ({_BM25_K1} + 1))
             / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / c.avgdl))
           ), 6) AS bm25
    FROM tf
    JOIN df ON df.word = tf.word
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN corpus c
    GROUP BY tf.doc_id
  )
  SELECT doc_id, bm25 FROM scored
  ORDER BY bm25 DESC, doc_id LIMIT 20
"""


@register("q_text_bm25", oracle=_BM25_ORACLE, tags=("text", "retrieval", "scoring"))
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (Robertson/Sparck Jones, k1=1.2 b=0.75)
    for a fixed 3-term query, top-20 documents — the lexical half of
    every hybrid (BM25 + ANN) retrieval stack; the vector half is
    q_sim_ann_*.

    Numeric discipline: tf/df/dl/N are exact integers; idf is one ln
    per term over an exact ratio; a doc's score sums <= 3 term
    contributions, rounded at 6dp BEFORE the rank so engine libm
    drift cannot reorder the cut; ties break on doc_id. Scale shape:
    the tf table carries ONLY query-term postings (the IN filter
    prunes at the explode — at 100 TB this is the inverted-index
    lookup, |postings| not |corpus|); dl/avgdl are the standard
    per-doc-length side, joined at posting grain; top-20 is a
    TakeOrdered, no global sort."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("word").isin(*_BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    k1, b = _BM25_K1, _BM25_B
    contrib = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    ) * (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), "doc_id").limit(20)


# ---------------------------------------------------------------------------
# q_langid_confusion: classifier-eval confusion matrix for the langid rule
# ---------------------------------------------------------------------------

_CONFUSION_ORACLE = f"""
  WITH pred AS ({_LANGID_ORACLE})
  , cells AS (
    SELECT lang, predicted_lang, count(*) AS n_docs
    FROM pred GROUP BY lang, predicted_lang
  )
  SELECT lang, predicted_lang, n_docs,
         round(CAST(n_docs AS DOUBLE)
               / sum(n_docs) OVER (PARTITION BY lang), 6) AS recall,
         round(CAST(n_docs AS DOUBLE)
               / sum(n_docs) OVER (PARTITION BY predicted_lang), 6)
           AS precision
  FROM cells
"""


@register(
    "q_langid_confusion",
    oracle=_CONFUSION_ORACLE,
    tags=("text", "langid", "eval", "quality"),
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as an operator: the confusion matrix of
    q_text_langid's marker-lexicon prediction against the labeled lang
    column, with per-actual-class recall and per-predicted-class
    precision on every cell — the eval report a data pipeline attaches
    to any heuristic classifier before trusting it as a filter
    (q_text_langid predicts; this op says HOW WELL, per class,
    exactly).

    Composition: reuses text_langid's DataFrame directly (one
    definition of the rule — drift between predictor and eval is
    structurally impossible); the matrix aggregate collapses to
    |langs| x |predictions| cells, and both marginals ride windows
    over that bounded grain. Scale shape: the doc-grain work is
    text_langid's map-only scoring pass + ONE count aggregate;
    everything after is classes-squared arithmetic."""
    pred = text_langid(spark, sf_dir)
    cells = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w_actual = Window.partitionBy("lang")
    w_pred = Window.partitionBy("predicted_lang")
    return cells.select(
        "lang",
        "predicted_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w_actual), 6
        ).alias("recall"),
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w_pred), 6
        ).alias("precision"),
    )
