"""Phrase suggester: whole-phrase "did you mean" (the ES phrase suggester).

Per input phrase, every token expands to a bounded candidate set (itself
plus vocabulary terms within ``max_edits`` Levenshtein edits, ranked by
(edits, popularity, term) and capped), candidate PHRASES are the exact
cross product of the slots, and each candidate phrase is scored under the
corpus's add-alpha bigram language model (the same estimator
:func:`~fulltextsearch_spark.operators.textstats.bigram_lm_scores` uses)
plus a per-correction log-penalty — the ES phrase suggester's
candidate-generator x language-model-scorer design, made exact instead of
beam-searched so the result is a pure function of the corpus and
SQL-replayable.

Scale shape: the phrase side is a QUERY SET (tiny, driver-known); the
corpus-side artifacts are one vocabulary aggregate and the two bigram
count tables (map-side-partial hash aggregates, the tf-table shuffle
shape). Candidate generation joins the broadcast slot words against the
vocabulary with a length-band prune; combo assembly is per-slot joins of
bounded (<= cap^n_slots) rows; LM scoring joins the tiny combo-bigram set
broadcast against the corpus bigram table, so the corpus-scale side never
shuffles for the suggest path. Exactness over beams is the right trade
precisely because slots * cap is bounded; at ES defaults (cap<=5, phrases
<=5 tokens) the cross product is <= 3125 rows per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fulltextsearch_spark.functions.tokenizer import tokenize, tokenize_udf

__all__ = ["suggest_phrases"]


def suggest_phrases(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 3,
    max_edits: int = 1,
    cap_per_slot: int = 3,
    alpha: float = 0.5,
    error_log2: float = -3.0,
    min_occ: int = 1,
    max_slots: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """-> (query_id, rank, suggestion, score): top-k corrected phrases.

    ``score = sum over phrase bigrams of log2 P(w2|w1) + n_corrections *
    error_log2`` with ``P(w2|w1) = (C(w1 w2)+alpha)/(C(w1 .)+alpha*V)``
    (unseen contexts/bigrams fall back through the same formula with the
    missing count at 0). Single-token phrases score by the unigram analogue
    ``log2 ((occ+alpha)/(n_tokens+alpha*V))``. Ties break by suggestion
    text ascending. Phrases whose tokenization is empty yield no rows.
    """
    spark = docs.sparkSession
    slots_rows = []
    for qid, phrase in queries:
        words = tokenize(phrase, do_stem=False)
        if len(words) > max_slots:
            raise ValueError(
                f"phrase {qid!r} has {len(words)} tokens > max_slots={max_slots}; "
                "the exact cross product is only bounded for short phrases"
            )
        for i, w in enumerate(words):
            slots_rows.append((qid, len(words), i, w))
    if not slots_rows:
        return spark.createDataFrame(
            [], "query_id STRING, rank LONG, suggestion STRING, score DOUBLE"
        )
    slots = spark.createDataFrame(
        slots_rows, "query_id STRING, n_slots INT, slot INT, word STRING"
    )

    toks = docs.select(tokenize_udf(do_stem=False)(F.col(text_col)).alias("toks"))
    vocab_all = (
        toks.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )
    vocab = vocab_all.filter(F.col("n_occ") >= min_occ)
    # scalar totals derive from the vocab aggregate — no second corpus pass
    totals = vocab_all.agg(
        F.sum("n_occ").cast("double").alias("n_tokens"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    n = F.size("toks")
    big = (
        toks.where(n >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n - 1).alias("w1"),
                    F.slice("toks", 2, n - 1).alias("w2"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    ctx = big.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("c1"))
    bgc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("c2"))

    # candidate terms per slot: length-band prune -> levenshtein <= max_edits,
    # PLUS the source token itself (ES keeps it even out-of-vocabulary, so a
    # phrase never vanishes just because one slot has no near neighbor),
    # ranked (edits, popularity desc, term) and capped
    matches = (
        vocab.join(
            F.broadcast(slots),
            F.abs(F.length("term") - F.length("word")) <= max_edits,
        )
        .withColumn("edits", F.levenshtein("term", "word"))
        .filter(F.col("edits") <= max_edits)
        .select("query_id", "n_slots", "slot", "term", "edits", "n_occ")
    )
    orig = (
        slots.select(
            "query_id", "n_slots", "slot", F.col("word").alias("term")
        )
        .join(vocab, "term", "left")
        .select(
            "query_id", "n_slots", "slot", "term",
            F.lit(0).alias("edits"),
            F.coalesce("n_occ", F.lit(0)).alias("n_occ"),
        )
    )
    cand = (
        matches.unionByName(orig)
        .groupBy("query_id", "n_slots", "slot", "term")
        .agg(F.min("edits").alias("edits"), F.max("n_occ").alias("n_occ"))
    )
    cw = Window.partitionBy("query_id", "slot").orderBy(
        "edits", F.desc("n_occ"), "term"
    )
    cand = (
        cand.withColumn("_rn", F.row_number().over(cw))
        .filter(F.col("_rn") <= cap_per_slot)
        .select("query_id", "n_slots", "slot", "term", "edits")
    )

    # exact combo assembly: per-slot joins, queries drop out once complete
    max_len = max(r[1] for r in slots_rows)
    combos = (
        cand.filter(F.col("slot") == 0)
        .select(
            "query_id",
            "n_slots",
            F.array("term").alias("ws"),
            F.col("edits").cast("long").alias("n_edits"),
        )
    )
    done = combos.filter(F.col("n_slots") == 1)
    for i in range(1, max_len):
        nxt = cand.filter(F.col("slot") == i).select(
            "query_id", F.col("term").alias("_t"), F.col("edits").alias("_e")
        )
        combos = (
            combos.filter(F.col("n_slots") > i)
            .join(nxt, "query_id")
            .select(
                "query_id",
                "n_slots",
                F.concat("ws", F.array("_t")).alias("ws"),
                (F.col("n_edits") + F.col("_e")).cast("long").alias("n_edits"),
            )
        )
        done = done.unionByName(combos.filter(F.col("n_slots") == i + 1))

    # LM score: bigram chain for n_slots >= 2, unigram analogue for 1
    ns = F.size("ws")
    multi = done.filter(F.col("n_slots") >= 2)
    mbig = multi.select(
        "query_id",
        "ws",
        "n_edits",
        F.explode(
            F.arrays_zip(
                F.slice("ws", 1, ns - 1).alias("w1"),
                F.slice("ws", 2, ns - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select(
        "query_id", "ws", "n_edits",
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"),
    )
    p = (F.coalesce("c2", F.lit(0.0)) + F.lit(alpha)) / (
        F.coalesce("c1", F.lit(0.0)) + F.lit(alpha) * F.col("v")
    )
    mscored = (
        mbig.join(bgc, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("query_id", "ws", "n_edits")
        .agg(F.sum(F.log2(p)).alias("_lm"))
    )
    single = (
        done.filter(F.col("n_slots") == 1)
        .select("query_id", "ws", "n_edits", F.element_at("ws", 1).alias("term"))
        .join(vocab, "term", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "query_id",
            "ws",
            "n_edits",
            F.log2(
                (F.coalesce(F.col("n_occ").cast("double"), F.lit(0.0)) + F.lit(alpha))
                / (F.col("n_tokens") + F.lit(alpha) * F.col("v"))
            ).alias("_lm"),
        )
    )
    scored = mscored.unionByName(single).select(
        "query_id",
        F.concat_ws(" ", "ws").alias("suggestion"),
        (F.col("_lm") + F.col("n_edits") * F.lit(error_log2)).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "suggestion")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "suggestion", "score")
    )
