"""Supervised-fine-tuning data preparation: conversation flattening
and contrastive training-pair generation.

The corpus-side LLM stack (text.py / dedup.py / llm_prep.py) ends at
document grain; fine-tuning pipelines additionally consume
INTERACTION data — multi-turn conversations flattened into training
strings, and (anchor, negative) pairs for contrastive objectives.
Both ops here are exact-oracled: ordering is total (ts, event_id /
draw index), randomness is md5-derived (the q_sample_weighted
discipline — rand() would resample on every retry; content-hash
draws make backfills reproducible), and numeric formatting is
integer-exact (floor-based cents, never engine-dependent double
repr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pypiper_spark.catalog import load_table
from pypiper_spark.registry import register

# ---------------------------------------------------------------------------
# q_dialogue_pack: sessionized events -> flattened training dialogues
# ---------------------------------------------------------------------------

_MAX_TURNS = 8  # turn budget per packed dialogue (truncation, not split)

# Shared CTE prefix: sessionized, role-tagged turns (the SQL twin of
# _session_turns below). Both SFT oracles build on it.
_TURNS_CTE = """
  WITH base AS (
    SELECT user_id, event_id, ts, event_type, value,
           lag(ts) OVER w AS prev_ts,
           row_number() OVER w AS rn
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ), marked AS (
    SELECT *,
           CASE WHEN ts - prev_ts <= INTERVAL 12 HOUR THEN 0 ELSE 1 END
             AS new_session
    FROM base
  ), sess AS (
    SELECT *,
           sum(new_session) OVER w2 AS session_no,
           max(new_session * rn) OVER w2 AS sess_start
    FROM marked
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
  ), turns AS (
    SELECT user_id, session_no, ts, event_id,
           rn - sess_start + 1 AS turn_idx,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS reward,
           (CASE WHEN (rn - sess_start) % 2 = 0 THEN 'U' ELSE 'A' END)
             || ':' || event_type || '@'
             || CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)
             AS txt
    FROM sess
  )
"""

_DIALOGUE_ORACLE = f"""
  {_TURNS_CTE}
  SELECT user_id,
         CAST(session_no AS BIGINT) AS session_no,
         count(*) AS n_turns,
         count(CASE WHEN turn_idx <= {_MAX_TURNS} THEN txt END) AS n_kept,
         string_agg(CASE WHEN turn_idx <= {_MAX_TURNS} THEN txt END,
                    ' | ' ORDER BY ts, event_id) AS dialogue
  FROM turns
  GROUP BY user_id, session_no
"""


@register(
    "q_dialogue_pack",
    oracle=_DIALOGUE_ORACLE,
    tags=("llm", "sft", "dialogue", "session", "window"),
)
def dialogue_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten sessionized event streams into SFT-style dialogue
    strings: 12-hour-gap sessions (q_sessionize's gaps-and-islands
    machinery; the wider gap matches this corpus's ~7 h median
    inter-event cadence, giving ~3-turn average sessions with the
    8-turn truncation non-vacuous at every SF — 10/138/1327 oversized
    sessions at sf0.001/0.01/0.1, measured),
    turns role-tagged by alternating parity (U:/A:), truncated to the
    first 8 turns, and joined into ONE training string per session
    with ' | ' separators — the conversation-flattening step every
    chat-model data pipeline runs before tokenization/packing.

    Determinism: turn order is total ((ts, event_id) — event_id
    unique), the turn payload formats value as integer cents via
    floor(v*100 + 0.5) (floor is exact on identical doubles in both
    engines; round()'s half-case mode is not something to trust
    cross-engine), and LISTAGG WITHIN GROUP carries the same total
    order — so the flattened string is bit-identical to the DuckDB
    string_agg twin.

    Scale shape: ALL FOUR window functions (lag, row_number, running
    sum, running max) ride ONE per-user sort — the session-start index
    comes from max(new_session * rn), not a second partitioning by
    (user, session), so no session-keyed exchange exists before the
    final aggregate; and that aggregate groups by (user_id,
    session_no), which the user_id hash partitioning already
    clusters, so Catalyst plans it WITHOUT a new shuffle (plan test
    pins one data-scaled Exchange total). Truncation is a null-out
    inside the aggregate (string_agg/listagg skip nulls), never a
    pre-filter that would need its own window pass."""
    turns = _session_turns(spark, sf_dir)
    kept = turns.select(
        "user_id",
        "session_no",
        "ts",
        "event_id",
        F.when(F.col("turn_idx") <= _MAX_TURNS, F.col("txt")).alias("kept_txt"),
    )
    return kept.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count("kept_txt").alias("n_kept"),
        F.expr(
            "listagg(kept_txt, ' | ') within group (order by ts, event_id)"
        ).alias("dialogue"),
    )


def _session_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized, role-tagged turns (the Spark twin of _TURNS_CTE):
    (user_id, session_no, ts, event_id, turn_idx, txt). All four
    window functions ride one per-user sort — see q_dialogue_pack's
    scale-shape docstring."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.lag("ts").over(w).alias("prev_ts"),
        F.row_number().over(w).alias("rn"),
    )
    marked = base.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        "rn",
        F.when(F.expr("ts - prev_ts <= INTERVAL 12 HOURS"), 0)
        .otherwise(1)
        .alias("new_session"),
    )
    sess = marked.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        "rn",
        F.sum("new_session").over(w).alias("session_no"),
        F.max(F.col("new_session") * F.col("rn")).over(w).alias("sess_start"),
    )
    txt = F.concat(
        F.when((F.col("rn") - F.col("sess_start")) % 2 == 0, "U").otherwise("A"),
        F.lit(":"),
        F.col("event_type"),
        F.lit("@"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").cast("string"),
    )
    return sess.select(
        "user_id",
        F.col("session_no").cast("bigint").alias("session_no"),
        "ts",
        "event_id",
        (F.col("rn") - F.col("sess_start") + 1).alias("turn_idx"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("reward"),
        txt.alias("txt"),
    )


_SFT_PAIRS_ORACLE = f"""
  {_TURNS_CTE}
  SELECT user_id,
         CAST(session_no AS BIGINT) AS session_no,
         CAST(turn_idx AS BIGINT) AS turn_idx,
         string_agg(txt, ' | ') OVER (
           PARTITION BY user_id, session_no ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS context,
         txt AS response
  FROM turns
  QUALIFY turn_idx >= 2
"""


@register(
    "q_sft_pairs",
    oracle=_SFT_PAIRS_ORACLE,
    tags=("llm", "sft", "pairs", "session", "window"),
)
def sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-turn prediction pairs from sessionized dialogues: every
    turn after the first becomes one (context, response) training
    example, where context is the ' | '-joined prefix of all earlier
    turns in the session and response is the turn itself — the pair
    extraction an SFT pipeline runs downstream of q_dialogue_pack's
    flattening (pack trains on whole conversations; this trains on
    per-turn completions).

    Determinism: the cumulative context is collect_list over an
    explicit ROWS [unbounded preceding, 1 preceding] frame riding the
    total (ts, event_id) order — frame-ordered aggregation, so the
    prefix string is exact in both engines (DuckDB: windowed
    string_agg with the same frame).

    Scale shape: the context window partitions by (user_id,
    session_no), which the turns' user_id hash partitioning already
    clusters — Catalyst adds a partition-local sort but NO second
    exchange (plan test pins one data-scaled Exchange total). Context
    strings grow quadratically only WITHIN a session, and sessions
    are corpus-bounded (68 turns max at 100x) — no global blowup."""
    turns = _session_turns(spark, sf_dir)
    wc = (
        Window.partitionBy("user_id", "session_no")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        turns.select(
            "user_id",
            "session_no",
            F.col("turn_idx").cast("bigint").alias("turn_idx"),
            F.array_join(F.collect_list("txt").over(wc), " | ").alias("context"),
            F.col("txt").alias("response"),
        )
        .filter(F.col("turn_idx") >= 2)
    )


_REWARD_PAIRS_ORACLE = f"""
  {_TURNS_CTE}
  , scored AS (
    SELECT user_id,
           CAST(session_no AS BIGINT) AS session_no,
           CAST(turn_idx AS BIGINT) AS turn_idx,
           string_agg(txt, ' | ') OVER (
             PARTITION BY user_id, session_no ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS context,
           txt, reward,
           first_value(txt) OVER w_min AS rejected,
           first_value(CASE WHEN turn_idx % 2 = 0 THEN reward END)
             OVER w_min AS rej_reward
    FROM turns
    WINDOW w_min AS (
      PARTITION BY user_id, session_no
      ORDER BY CASE WHEN turn_idx % 2 = 0 THEN reward END ASC NULLS LAST,
               ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
  )
  SELECT user_id, session_no, turn_idx, context,
         txt AS chosen, rejected,
         reward - rej_reward AS margin
  FROM scored
  WHERE turn_idx % 2 = 0 AND reward > rej_reward
"""


@register(
    "q_sft_reward_pairs",
    oracle=_REWARD_PAIRS_ORACLE,
    tags=("llm", "sft", "rlhf", "pairs", "session", "window"),
)
def sft_reward_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference triples (context, chosen, rejected) for reward-model
    / DPO training, mined from sessionized dialogues: each assistant
    turn whose reward (the event's value, in integer cents) strictly
    beats the session's WORST assistant turn becomes one triple —
    context is the ' | '-joined turn prefix (q_sft_pairs' frame),
    chosen is the turn itself, rejected is that worst turn, margin is
    the exact integer reward gap. Equal-reward pairs are dropped (no
    preference signal), which also guarantees chosen != rejected.

    Determinism: the rejected turn is first_value over an ordered
    full-partition frame whose sort key is (assistant-reward NULLS
    LAST, ts, event_id) — integer rewards and a total tie-break, so
    both engines elect the same turn; the margin is bigint arithmetic,
    never a float.

    Scale shape: THREE window passes (turn context, the min-election,
    plus the inherited sessionization) all partition by user_id or its
    (user_id, session_no) refinement, so everything rides the ONE
    per-user exchange (plan test pins one data-scaled Exchange);
    the min-election is a partition-local re-sort, not a shuffle.
    No joins, no self-join against the argmin — the election is a
    window, so the 100 TB plan is scan -> exchange -> sorted window
    chain -> filter."""
    turns = _session_turns(spark, sf_dir)
    is_a = F.col("turn_idx") % 2 == 0
    wc = (
        Window.partitionBy("user_id", "session_no")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_min = (
        Window.partitionBy("user_id", "session_no")
        .orderBy(
            F.when(is_a, F.col("reward")).asc_nulls_last(),
            "ts",
            "event_id",
        )
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    scored = turns.select(
        "user_id",
        "session_no",
        F.col("turn_idx").cast("bigint").alias("turn_idx"),
        F.array_join(F.collect_list("txt").over(wc), " | ").alias("context"),
        F.col("txt").alias("chosen"),
        "reward",
        F.first("txt").over(w_min).alias("rejected"),
        F.first(F.when(is_a, F.col("reward"))).over(w_min).alias("rej_reward"),
    )
    return (
        scored.filter(
            (F.col("turn_idx") % 2 == 0)
            & (F.col("reward") > F.col("rej_reward"))
        )
        .select(
            "user_id",
            "session_no",
            "turn_idx",
            "context",
            "chosen",
            "rejected",
            (F.col("reward") - F.col("rej_reward")).alias("margin"),
        )
    )


# ---------------------------------------------------------------------------
# q_contrastive_negatives: deterministic negative-pair generation
# ---------------------------------------------------------------------------

_K_NEG = 4  # negatives per anchor
_BATCH_TARGET = 256  # expected in-batch group size

_NEGATIVES_ORACLE = f"""
  WITH n AS (
    SELECT greatest(1, count(*) // {_BATCH_TARGET}) AS n_batches
    FROM documents
  ), idx AS (
    SELECT doc_id, source, md5(text) AS fp,
           md5('batch:' || CAST(doc_id AS VARCHAR)) AS h,
           CAST('0x' || substr(md5('batch:' || CAST(doc_id AS VARCHAR)),
                               1, 12) AS BIGINT)
             % (SELECT n_batches FROM n) AS batch
    FROM documents
  ), pos AS (
    SELECT doc_id, source, fp, batch,
           row_number() OVER (PARTITION BY batch ORDER BY h, doc_id) AS p,
           count(*) OVER (PARTITION BY batch) AS cnt
    FROM idx
  )
  SELECT a.doc_id AS anchor_id, b.doc_id AS neg_id,
         b.source AS neg_source, CAST(j.pair_no AS BIGINT) AS pair_no
  FROM pos a
  CROSS JOIN (SELECT unnest(range(1, {_K_NEG} + 1)) AS pair_no) j
  JOIN pos b
    ON b.batch = a.batch
   AND b.p = (a.p - 1 + j.pair_no) % a.cnt + 1
  WHERE b.doc_id <> a.doc_id AND b.fp <> a.fp
"""


@register(
    "q_contrastive_negatives",
    oracle=_NEGATIVES_ORACLE,
    tags=("llm", "sft", "pairs", "sample", "deterministic"),
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic IN-BATCH negative sampling for contrastive
    training: documents are hash-bucketed into ~256-doc batches
    (md5-derived batch id — content-addressed, so retries, backfills,
    and both engines form the SAME batches; rand() would not), ordered
    within each batch by a second hash, and each document takes the
    next 4 documents in its batch's CYCLIC ring order as negatives —
    the exact pairing an in-batch-negatives training loop sees.
    Self-pairs and exact-duplicate texts (same md5(text) — a
    near-positive labeled negative poisons the loss) are dropped.

    A mod-n dense-index design (draw k random doc_ids directly) was
    built first and REJECTED at the 100x sweep: the scaled corpus
    key-remaps doc_ids per copy, so dense indexing silently matched
    only the 1% of draws landing in copy-0's id range (29909 of the
    expected ~2M pairs). Batch-ring pairing never touches the id
    space, so it survives any id distribution — sparse, remapped, or
    sharded.

    Scale shape: batch count scales with the corpus (n/256, from a
    1-row count aggregate joined as a broadcast), so batches stay
    O(256) at any corpus size. ONE data-scaled exchange hashes docs to
    their batch; both windows (position, batch size) ride it; the
    ring join fans each doc to its 4 successor positions and joins
    back on (batch, position) — co-partitioned by the same batch
    hash, never a pair enumeration (plan test). At 100 TB this is a
    map-side 4x fanout plus one co-partitioned equi join. The
    position table is deliberately NOT checkpointed for its two
    consumers: the measured 100x A/B (warm, local[32]) read 2.11 s
    recomputed vs 2.26 s localCheckpoint'd — the page-cached scan +
    md5 recompute is cheaper than materializing n rows, the same
    verdict as q_graph_label_propagation's unpersisted pair table."""
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(
        F.greatest(
            F.lit(1), F.floor(F.count(F.lit(1)) / _BATCH_TARGET)
        ).alias("n_batches")
    )
    h = F.md5(
        F.concat(F.lit("batch:"), F.col("doc_id").cast("string")).cast("binary")
    )
    idx = (
        d.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "source",
            F.md5(F.col("text").cast("binary")).alias("fp"),
            h.alias("h"),
            (
                F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")
                % F.col("n_batches")
            ).alias("batch"),
        )
    )
    wp = Window.partitionBy("batch").orderBy("h", "doc_id")
    pos = idx.select(
        "doc_id",
        "source",
        "fp",
        "batch",
        F.row_number().over(wp).alias("p"),
        F.count(F.lit(1)).over(Window.partitionBy("batch")).alias("cnt"),
    )
    fanned = pos.select(
        F.col("doc_id").alias("anchor_id"),
        F.col("fp").alias("anchor_fp"),
        "batch",
        F.explode(F.sequence(F.lit(1), F.lit(_K_NEG))).alias("pair_no"),
        "p",
        "cnt",
    ).select(
        "anchor_id",
        "anchor_fp",
        "batch",
        "pair_no",
        ((F.col("p") - 1 + F.col("pair_no")) % F.col("cnt") + 1).alias("tp"),
    )
    negs = pos.select(
        F.col("batch").alias("nbatch"),
        F.col("p").alias("np"),
        F.col("doc_id").alias("neg_id"),
        F.col("source").alias("neg_source"),
        F.col("fp").alias("neg_fp"),
    )
    return (
        fanned.join(
            negs,
            (F.col("batch") == F.col("nbatch")) & (F.col("tp") == F.col("np")),
        )
        .filter(
            (F.col("neg_id") != F.col("anchor_id"))
            & (F.col("neg_fp") != F.col("anchor_fp"))
        )
        .select(
            "anchor_id",
            "neg_id",
            "neg_source",
            F.col("pair_no").cast("bigint").alias("pair_no"),
        )
    )


# ---------------------------------------------------------------------------
# q_pipeline_sft_build: the composed SFT corpus-build flagship
# ---------------------------------------------------------------------------

_SFT_REWARD_FLOOR = 2000  # session assistant reward >= $20 (integer cents)

_SFT_BUILD_ORACLE = f"""
  {_TURNS_CTE}
  , sess_agg AS (
    SELECT user_id,
           CAST(session_no AS BIGINT) AS session_no,
           count(*) AS n_turns,
           count(CASE WHEN turn_idx % 2 = 0 THEN 1 END) AS n_assistant,
           CAST(coalesce(sum(CASE WHEN turn_idx % 2 = 0 THEN reward END), 0)
                AS BIGINT) AS reward_sum,
           count(CASE WHEN turn_idx <= {_MAX_TURNS} THEN txt END) AS n_kept,
           string_agg(CASE WHEN turn_idx <= {_MAX_TURNS} THEN txt END,
                      ' | ' ORDER BY ts, event_id) AS dialogue
    FROM turns
    GROUP BY user_id, session_no
  ), gated AS (
    SELECT *,
           CASE WHEN (strpos('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16
                   + strpos('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1 < 13
                  THEN 'val'
                WHEN (strpos('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16
                   + strpos('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1 < 26
                  THEN 'test'
                ELSE 'train' END AS split
    FROM sess_agg
    WHERE n_turns >= 2 AND n_assistant >= 1
      AND reward_sum >= {_SFT_REWARD_FLOOR}
  )
  SELECT split,
         count(DISTINCT user_id) AS n_users,
         count(*) AS n_dialogues,
         CAST(sum(n_turns) AS BIGINT) AS n_turns_total,
         CAST(sum(n_kept) AS BIGINT) AS n_kept_total,
         CAST(sum(length(dialogue)) AS BIGINT) AS n_chars_total,
         CAST(sum(reward_sum) AS BIGINT) AS reward_total,
         bit_xor(user_id * 4096 + session_no) AS fingerprint
  FROM gated
  GROUP BY split
"""


@register(
    "q_pipeline_sft_build",
    oracle=_SFT_BUILD_ORACLE,
    tags=("llm", "sft", "pipeline", "session", "split"),
)
def pipeline_sft_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SFT corpus build as ONE composed job — the interaction-data
    twin of q_pipeline_corpus_build's document pipeline: sessionize ->
    flatten (q_dialogue_pack's aggregate) -> quality-gate (>= 2 turns,
    >= 1 assistant turn, session assistant reward >= $20 — the
    engagement floor; prunes ~47% of sessions at sf0.01 (3292 -> 1744), measured) ->
    leakage-safe USER-grain split (md5 first-byte buckets, the
    q_split_leakage_safe arithmetic: a user's conversations never
    straddle train/val — per-session splitting leaks user style
    across the eval boundary) -> per-split accounting with an
    order-independent bit_xor fingerprint of (user, session).

    Scale shape: the whole pipeline is ONE data-scaled exchange (the
    user-keyed sessionization shuffle) — the session aggregate rides
    the user_id partitioning, the gate is a post-aggregate filter,
    the split is map-side md5 arithmetic, and the final 3-group
    report aggregates with map-side partials. Session_no < 4096 by
    corpus bound (68-turn max sessions), so the fingerprint packing
    never collides across users; bit_xor never overflows at any
    scale. Plan test pins one data-scaled Exchange and zero joins."""
    turns = _session_turns(spark, sf_dir)
    is_a = F.col("turn_idx") % 2 == 0
    sess = turns.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count(F.when(is_a, 1)).alias("n_assistant"),
        F.coalesce(F.sum(F.when(is_a, F.col("reward"))), F.lit(0))
        .cast("long")
        .alias("reward_sum"),
        F.count(F.when(F.col("turn_idx") <= _MAX_TURNS, F.col("txt"))).alias(
            "n_kept"
        ),
        F.expr(
            f"listagg(CASE WHEN turn_idx <= {_MAX_TURNS} THEN txt END, ' | ')"
            " within group (order by ts, event_id)"
        ).alias("dialogue"),
    )
    uid = "cast(cast(user_id as string) as binary)"
    hexs = "0123456789abcdef"
    bucket = (
        (F.expr(f"instr('{hexs}', substring(md5({uid}), 1, 1))") - 1) * 16
        + F.expr(f"instr('{hexs}', substring(md5({uid}), 2, 1))")
        - 1
    )
    gated = sess.filter(
        (F.col("n_turns") >= 2)
        & (F.col("n_assistant") >= 1)
        & (F.col("reward_sum") >= _SFT_REWARD_FLOOR)
    ).withColumn(
        "split",
        F.when(bucket < 13, "val").when(bucket < 26, "test").otherwise("train"),
    )
    return gated.groupBy("split").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_dialogues"),
        F.sum("n_turns").alias("n_turns_total"),
        F.sum("n_kept").alias("n_kept_total"),
        F.sum(F.length("dialogue")).alias("n_chars_total"),
        F.sum("reward_sum").alias("reward_total"),
        F.expr("bit_xor(user_id * 4096 + session_no)").alias("fingerprint"),
    )
