"""Cross-operator equivalences and invariants for the newer query
pack (subqueries, funnel, argmax): each query is checked against an
INDEPENDENTLY-built Spark formulation, complementing the DuckDB
oracle gate with engine-internal consistency.
"""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pypiper_spark.catalog import load_table
from pypiper_spark.compare import cents
from pypiper_spark.registry import all_queries

QS = all_queries()


def _rows(df, *cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_funnel_stages_are_monotone(spark, sf_dir):
    row = QS["q_events_funnel"].fn(spark, sf_dir).collect()[0]
    assert row.n_view >= row.n_view_click >= row.n_full_funnel >= 0
    assert 0.0 <= row.purchase_rate <= row.click_rate <= 1.0


def test_subquery_in_equals_explicit_semi_join(spark, sf_dir):
    got = _rows(QS["q_subquery_in"].fn(spark, sf_dir), "c_custkey")
    c = load_table(spark, sf_dir, "customer")
    hot = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    want = _rows(c.join(hot, "c_custkey", "left_semi"), "c_custkey")
    assert got == want


def test_not_in_and_in_partition_the_part_table(spark, sf_dir):
    """anti(pred) and semi(pred) split part exactly (disjoint, total)."""
    anti = _rows(QS["q_subquery_not_in"].fn(spark, sf_dir), "p_partkey")
    p = load_table(spark, sf_dir, "part")
    hot = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    semi = _rows(p.join(hot, "p_partkey", "left_semi"), "p_partkey")
    allk = _rows(p, "p_partkey")
    assert anti.isdisjoint(semi)
    assert anti | semi == allk


def test_argmax_agrees_with_window_formulation(spark, sf_dir):
    got = _rows(
        QS["q_agg_argmax"].fn(spark, sf_dir),
        "o_orderpriority", "best_order", "best_price",
    )
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc(cents("o_totalprice")), F.desc("o_orderkey")
    )
    want = _rows(
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderkey").alias("best_order"),
            F.col("o_totalprice").alias("best_price"),
        ),
        "o_orderpriority", "best_order", "best_price",
    )
    assert got == want


def test_corr_scalar_keeps_only_above_customer_average(spark, sf_dir):
    """Every surviving order beats its own customer's exact mean
    (validated in exact integer-cents arithmetic on collected data)."""
    out = QS["q_subquery_corr_scalar"].fn(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    import collections

    sums: dict[int, list] = collections.defaultdict(lambda: [0, 0])
    for r in o.select("o_custkey", "o_totalprice").collect():
        c = sums[r.o_custkey]
        c[0] += round(r.o_totalprice * 100)
        c[1] += 1
    kept = out.select("o_custkey", "o_totalprice").collect()
    assert kept, "non-vacuous at every sf"
    for r in kept:
        tot, n = sums[r.o_custkey]
        assert round(r.o_totalprice * 100) * n > tot


def test_star_components_log_rounds_on_chain(spark):
    """Adversarial diameter: a 200-node chain. Min-label propagation
    needs ~diameter rounds (the min label moves one hop per round);
    large-star/small-star must land the same single component in
    O(log n) rounds — the property that makes it the 100 TB choice."""
    from pypiper_spark.queries.dedup import _star_components

    n = 200
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    sym = chain.union(chain.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels, rounds = _star_components(sym)
    got = {(r.node, r.lbl) for r in labels.collect()}
    assert got == {(i, 0) for i in range(n)}
    assert rounds <= 12, f"star contraction took {rounds} rounds on a 200-chain"


def test_star_equals_propagation_on_corpus(spark, sf_dir):
    """The docstring claim of q_dedup_components, made true: min-label
    propagation and large-star/small-star contraction produce IDENTICAL
    (node, label) sets on the actual corpus near-dup edge graph (the
    >=0.6 Jaccard pairs q_dedup_ngram_jaccard emits — the same edge
    construction the component query uses)."""
    from pypiper_spark.queries.dedup import _star_components

    edges = QS["q_dedup_ngram_jaccard"].fn(spark, sf_dir).select("id_a", "id_b")
    sym = (
        edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .union(edges.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    star = {(r.node, r.lbl) for r in _star_components(sym)[0].collect()}
    # Reference formulation: plain min-label propagation to fixpoint
    # (diameter-bounded — fine as a test oracle at test scale).
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint()
    )
    for _ in range(50):
        neigh = sym.join(
            labels.select(F.col("node").alias("b"), F.col("lbl").alias("nlbl")), "b"
        ).select(F.col("a").alias("node"), F.col("nlbl").alias("lbl"))
        new_labels = (
            labels.union(neigh).groupBy("node").agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint()
        changed = (
            new_labels.join(labels.select("node", F.col("lbl").alias("old")), "node")
            .filter(F.col("lbl") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    prop = {(r.node, r.lbl) for r in labels.collect()}
    assert star == prop


def test_dedup_components_matches_python_union_find(spark, sf_dir):
    """q_dedup_components vs a pure-Python union-find over the SAME
    edge set (q_dedup_ngram_jaccard emits exactly the >=0.6 pairs the
    component query builds its graph from)."""
    edges = [
        (r.id_a, r.id_b)
        for r in QS["q_dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    ]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    import collections

    comps = collections.defaultdict(list)
    for node in parent:
        comps[find(node)].append(node)
    want = {(root, len(ms), max(ms)) for root, ms in comps.items()}
    got = _rows(
        QS["q_dedup_components"].fn(spark, sf_dir), "comp_id", "n_docs", "max_doc_id"
    )
    assert got == want


def test_label_propagation_matches_python_reference(spark, sf_dir):
    """q_graph_label_propagation vs a from-scratch Python synchronous
    LPA (Counter votes, self-vote, max-count-then-min-label) on the
    same co-purchase edges: catches any systematic bug the packed
    BIGINT argmax and the unrolled-CTE oracle could share."""
    from collections import Counter, defaultdict

    li = load_table(spark, sf_dir, "lineitem")
    pairs = {
        (r.pa, r.pb)
        for r in li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .alias("a")
        .join(
            li.select(
                F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb")
            ).distinct(),
            "o",
        )
        .filter(F.col("p") < F.col("pb"))
        .select(F.col("p").alias("pa"), "pb")
        .distinct()
        .collect()
    }
    adj = defaultdict(list)
    nodes = set()
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
        nodes.update((a, b))
    for v in nodes:
        adj[v].append(v)  # the self-vote
    lbl = {v: v for v in nodes}
    for _ in range(4):  # _LPA_ROUNDS
        lbl = {
            v: max(
                Counter(lbl[u] for u in adj[v]).items(),
                key=lambda kv: (kv[1], -kv[0]),
            )[0]
            for v in nodes
        }
    got = {
        (r.part_key, r.community)
        for r in QS["q_graph_label_propagation"].fn(spark, sf_dir).collect()
    }
    assert got == set(lbl.items())


def test_substring_apply_removed_matches_detector_span_union(spark, sf_dir):
    """Cross-operator: per document, the apply query's n_removed must
    equal the UNION length of the detector's token spans (spans from
    separate islands can overlap in token coverage, so union, not
    sum)."""
    spans = {}
    for r in QS["q_dedup_substring"].fn(spark, sf_dir).collect():
        spans.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_start + r.span_len - 1)
        )
    union_len = {}
    for doc, ivs in spans.items():
        covered = set()
        for s, e in ivs:
            covered.update(range(s, e + 1))
        union_len[doc] = len(covered)
    removed = {
        r.doc_id: r.n_removed
        for r in QS["q_dedup_substring_apply"].fn(spark, sf_dir).collect()
        if r.n_removed > 0
    }
    assert removed == {d: n for d, n in union_len.items() if n > 0}


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """q_bpe_train vs a from-scratch Python BPE (word-frequency table,
    weighted pair counts, max-count-then-lexicographic-min tie-break):
    the merge tables must be identical, rank for rank."""
    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    cnt = Counter()
    for r in docs:
        for w in r.text.split(" "):
            if w:
                cnt[w] += 1
    seqs = {w: tuple(w) for w in cnt}
    want = []
    for rank in range(1, 9):  # _BPE_MERGES
        pc = Counter()
        for w, c in cnt.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, l, r, l + r, c))
        for w in seqs:
            s = seqs[w]
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in QS["q_bpe_train"].fn(spark, sf_dir).orderBy("rank").collect()
    ]
    assert got == want


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    """q_bpe_encode vs a from-scratch Python BPE train+encode over the
    same corpus: per-(lang, source) token/piece/chars-saved/word-form
    aggregates must be identical. Reuses nothing from the Spark path —
    merges are re-learned in pure Python (the
    test_bpe_train_matches_python_reference recompute) and applied
    per word, then aggregated with collections arithmetic."""
    from collections import Counter, defaultdict

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "source", "text"
    ).collect()
    cnt = Counter()
    for r in docs:
        for w in r.text.split(" "):
            if w:
                cnt[w] += 1
    seqs = {w: tuple(w) for w in cnt}
    rules = []
    for _rank in range(1, 9):
        pc = Counter()
        for w, c in cnt.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (l, rr), _c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((l, rr))
        for w in seqs:
            s = seqs[w]
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == rr:
                    out.append(l + rr)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    n_pieces = {w: len(s) for w, s in seqs.items()}
    agg = defaultdict(lambda: [0, 0, 0, set()])
    for r in docs:
        for w in r.text.split(" "):
            if not w:
                continue
            a = agg[(r.lang, r.source)]
            a[0] += 1
            a[1] += n_pieces[w]
            a[2] += len(w) - n_pieces[w]
            a[3].add(w)
    want = {
        k: (v[0], v[1], v[2], len(v[3])) for k, v in agg.items()
    }
    got = {
        (r.lang, r.source): (
            r.total_tokens,
            r.total_pieces,
            r.chars_saved,
            r.n_word_forms,
        )
        for r in QS["q_bpe_encode"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_cluster_kmeans_matches_numpy_recompute(spark, sf_dir):
    """q_cluster_kmeans vs a full numpy re-assignment against the SAME
    persisted centroid artifact: per-cluster size / majority label /
    majority count must be identical (ties toward smaller label on
    both sides)."""
    from collections import Counter

    import numpy as np

    from pypiper_spark.queries.vectors import build_ivf_index

    C = np.array(build_ivf_index(spark, sf_dir, k=16), dtype=np.float64)
    rows = load_table(spark, sf_dir, "embeddings").select(
        "embedding", "label"
    ).collect()
    E = np.array([r.embedding for r in rows], dtype=np.float64)
    labels = np.array([r.label for r in rows])
    d2 = (E * E).sum(axis=1, keepdims=True) - 2 * E @ C.T + (C * C).sum(axis=1)
    assign = d2.argmin(axis=1)
    want = {}
    for cl in np.unique(assign):
        lab = labels[assign == cl]
        cnt = Counter(int(x) for x in lab)
        maj, n_maj = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        want[int(cl)] = (len(lab), maj, n_maj)
    got = {
        r.cluster_id: (r.n_vectors, r.majority_label, r.n_majority)
        for r in QS["q_cluster_kmeans"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_bpe_bytes_train_matches_python_reference(spark, sf_dir):
    """q_bpe_train_bytes vs a from-scratch pure-Python BYTE-level BPE:
    UTF-8 byte alphabet, minted ids 256+, weighted pair counts,
    max-count-then-smallest-(l,r) tie-break, specials excluded from
    the statistics. Merge tables must match rank for rank."""
    from collections import Counter

    from pypiper_spark.queries.llm_prep import _BPE_SPECIALS

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    cnt = Counter()
    for r in docs:
        for w in r.text.split(" "):
            if w and w not in _BPE_SPECIALS:
                cnt[w] += 1
    seqs = {w: tuple(w.encode("utf-8")) for w in cnt}
    want = []
    next_id = 256
    for rank in range(1, 9):  # _BPE_BYTES_MERGES
        pc = Counter()
        for w, c in cnt.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, l, r, next_id, c))
        for w in seqs:
            s = seqs[w]
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
        next_id += 1
    got = [
        (r.rank, r.left_id, r.right_id, r.new_id, r.pair_count)
        for r in QS["q_bpe_train_bytes"].fn(spark, sf_dir).orderBy("rank").collect()
    ]
    assert got == want
    # byte fallback is structural: every initial symbol is a byte, so
    # every left/right id is either a byte or a previously minted id
    for rank, l, r, new, _ in got:
        assert l < 256 or 256 <= l < new
        assert r < 256 or 256 <= r < new


def test_bpe_bytes_encode_matches_python_reference(spark, sf_dir):
    """q_bpe_encode_bytes vs pure-Python byte-BPE train+encode with
    explicit special-token accounting (one atomic <|endoftext|> per
    document). All five aggregate columns must match per (lang,
    source); the special contributes exactly 1 piece per doc."""
    from collections import Counter, defaultdict

    from pypiper_spark.queries.llm_prep import _BPE_SPECIALS

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "source", "text"
    ).collect()
    cnt = Counter()
    for r in docs:
        for w in r.text.split(" "):
            if w and w not in _BPE_SPECIALS:
                cnt[w] += 1
    # train (identical loop to the train test)
    seqs = {w: tuple(w.encode("utf-8")) for w in cnt}
    rules = []
    next_id = 256
    for _ in range(8):
        pc = Counter()
        for w, c in cnt.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (l, r), _c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((l, r, next_id))
        for w in seqs:
            s = seqs[w]
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
        next_id += 1

    def n_pieces(w: str) -> int:
        s = list(w.encode("utf-8"))
        for l, r, new in rules:
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(new)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return len(s)

    agg = defaultdict(lambda: [0, 0, 0, set(), 0])  # tok, pieces, saved, forms, docs
    for r in docs:
        k = (r.lang, r.source)
        agg[k][4] += 1
        for w in r.text.split(" "):
            if not w or w in _BPE_SPECIALS:
                continue
            p = n_pieces(w)
            agg[k][0] += 1
            agg[k][1] += p
            agg[k][2] += len(w.encode("utf-8")) - p
            agg[k][3].add(w)
    got = {
        (r.lang, r.source): (
            r.total_tokens,
            r.total_pieces,
            r.bytes_saved,
            r.n_specials,
            r.n_word_forms,
        )
        for r in QS["q_bpe_encode_bytes"].fn(spark, sf_dir).collect()
    }
    want = {
        k: (v[0], v[1] + v[4], v[2], v[4], len(v[3]))
        for k, v in agg.items()
    }
    assert got == want


def test_unigram_lm_train_matches_python_reference(spark, sf_dir):
    """q_unigram_lm_train vs a from-scratch pure-Python unigram-LM EM:
    same seed rule (weighted substrings len<=4, top-2000 by (-n, p),
    all single chars kept), same Viterbi tie-breaks (longer last piece
    i.e. smaller split point, via strict j<back comparison), 3 EM
    rounds, same final ranking — piece table must match row for row
    including the integer-scaled log-probs."""
    import math
    from collections import Counter

    from pypiper_spark.queries.llm_prep import (
        _BPE_SPECIALS,
        _UNI_EM_ITERS,
        _UNI_OUT_K,
        _UNI_SEED_MAX_LEN,
        _UNI_VOCAB_K,
    )

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    wc = Counter()
    for r in docs:
        for w in r.text.split(" "):
            if w and w not in _BPE_SPECIALS:
                wc[w] += 1

    # seed
    subs = Counter()
    for w, c in wc.items():
        for ln in range(1, _UNI_SEED_MAX_LEN + 1):
            for i in range(len(w) - ln + 1):
                subs[w[i : i + ln]] += c
    top = dict(sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:_UNI_VOCAB_K])
    for p, n in subs.items():
        if len(p) == 1:
            top[p] = n
    total = float(sum(top.values()))
    logp = {p: math.log(n / total) for p, n in top.items()}

    def viterbi(w, lp):
        n = len(w)
        best = [0.0] + [float("-inf")] * n
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            for j in range(max(0, i - _UNI_SEED_MAX_LEN), i):
                piece = w[j:i]
                v = lp.get(piece)
                if v is None:
                    continue
                cand = best[j] + v
                if cand > best[i] or (cand == best[i] and j < back[i]):
                    best[i] = cand
                    back[i] = j
        if best[n] == float("-inf"):
            return list(w)
        out, i = [], n
        while i > 0:
            out.append(w[back[i] : i])
            i = back[i]
        return out[::-1]

    counts = None
    for _ in range(_UNI_EM_ITERS):
        frozen = dict(logp)
        counts = Counter()
        for w, c in wc.items():
            for p in viterbi(w, frozen):
                counts[p] += c
        tot = float(sum(counts.values()))
        logp = {p: math.log(n / tot) for p, n in counts.items()}

    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_UNI_OUT_K]
    want = [
        (rank, p, n, int(round(logp[p] * 1e8)))
        for rank, (p, n) in enumerate(ranked, start=1)
    ]
    from pypiper_spark.queries.llm_prep import _learn_unigram

    got = [(r[0], r[1], r[2], r[3]) for r in _learn_unigram(spark, sf_dir)]
    assert got == want
    # the registered decision form must assert all its own contracts
    dec = QS["q_unigram_lm_train"].fn(spark, sf_dir).toPandas()
    assert len(dec) == 1
    assert (
        dec.n_pieces_ok[0]
        and dec.counts_bounded_ok[0]
        and dec.scores_negative_ok[0]
        and dec.prob_mass_ok[0]
    )
