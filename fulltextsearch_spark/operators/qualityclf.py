"""Model-based quality filtering: a multinomial Naive Bayes text classifier.

The published web-corpus pipelines pair their rule filters with a learned
model filter: CCNet (Wenzek et al., LREC 2020) and LLaMA score pages with a
fastText classifier trained on a target domain (Wikipedia) vs the raw crawl,
and GPT-3 (Brown et al. 2020, App. A) uses a logistic classifier over
hashed features the same way. Multinomial NB over the engine's own token
stream is the closed-form member of that family: training is ONE counting
aggregate (no iterations), scoring is a per-token weight sum, and every
quantity is a fixed arithmetic dag over integer counts — so the whole
model, not just its decisions, replays in SQL.

Model: for classes 1 (target) / 0 (background) with add-alpha smoothing
over the training vocabulary V,

    llr(t)    = ln((c1(t) + a) / (N1 + a*V)) - ln((c0(t) + a) / (N0 + a*V))
    prior_llr = ln(D1 / D0)
    oov_llr   = llr of an unseen term (c1 = c0 = 0)

and a document scores ``prior_llr + sum_t tf(t) * llr(t)`` with OOV tokens
contributing ``oov_llr`` — positive means "looks like the target domain".

Scale shape: training touches only the labeled seed docs (the labels frame
is joined BEFORE tokenization, so the corpus-scale table is never
tokenized for training); its one wide op is the (term)-keyed count
aggregate. Scoring is tokenize + explode + a join against the weight table
— broadcast when the training vocabulary fits (the common case: seed sets
are curated and small), else an ordinary shuffle join on the term key —
then one per-doc hash aggregate. Nothing is iterative and no step's state
exceeds the vocabulary.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["NBModel", "nb_train", "nb_score"]


@dataclass(frozen=True)
class NBModel:
    """weights: (term, llr); consts: one row (prior_llr, oov_llr, v)."""

    weights: DataFrame
    consts: DataFrame


def nb_train(
    docs: DataFrame,
    labels: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    stem: bool = False,
) -> NBModel:
    """Train multinomial NB from ``labels`` = (doc_id, label in {0, 1}).

    Both classes must contain at least one labeled doc with at least one
    token (the log-ratios are undefined otherwise); raises ValueError if
    not. Duplicate doc_ids in ``labels`` are the caller's bug — each
    occurrence counts again, exactly as it would in the SQL replay.
    """
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf

    lab = labels.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("label").cast("int").alias("label"),
    )
    seed = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col(text_col)
    ).join(lab, "doc_id")
    toks = seed.select(
        "label", F.explode(tokenize_udf(do_stem=stem)(F.col(text_col))).alias("term")
    )
    is1 = (F.col("label") == 1).cast("long")
    cnt = toks.groupBy("term").agg(
        F.sum(is1).alias("c1"), F.sum(1 - is1).alias("c0")
    )
    tot = cnt.agg(
        F.sum("c1").alias("n1"),
        F.sum("c0").alias("n0"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    dcnt = lab.agg(
        F.sum(is1).alias("d1"), F.sum(1 - is1).alias("d0")
    )
    row = tot.crossJoin(dcnt).collect()[0]
    n1, n0, v, d1, d0 = (int(row[c]) for c in ("n1", "n0", "v", "d1", "d0"))
    if n1 == 0 or n0 == 0 or d1 == 0 or d0 == 0:
        raise ValueError(
            "nb_train needs >=1 labeled doc with >=1 token in EACH class "
            f"(got tokens {n1}/{n0}, docs {d1}/{d0})"
        )
    den1, den0 = F.lit(float(n1) + alpha * v), F.lit(float(n0) + alpha * v)
    weights = cnt.select(
        "term",
        (
            F.log((F.col("c1") + F.lit(alpha)) / den1)
            - F.log((F.col("c0") + F.lit(alpha)) / den0)
        ).alias("llr"),
    )
    import math

    spark = docs.sparkSession
    consts = spark.createDataFrame(
        [
            (
                math.log(d1 / d0),
                math.log(alpha / (n1 + alpha * v)) - math.log(alpha / (n0 + alpha * v)),
                v,
            )
        ],
        "prior_llr DOUBLE, oov_llr DOUBLE, v LONG",
    )
    return NBModel(weights=weights, consts=consts)


def nb_score(
    docs: DataFrame,
    model: NBModel,
    text_col: str = "text",
    stem: bool = False,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every doc: ``(doc_id, n_toks, nb_llr, pred)``.

    ``nb_llr = prior_llr + sum(per-token llr)`` (OOV tokens use
    ``oov_llr``), rounded to 4 dp; ``pred = 1`` iff the pre-rounding score
    is positive. 0-token docs score exactly ``prior_llr``. Set
    ``broadcast_model=False`` when the training vocabulary is itself
    corpus-scale and the term join must shuffle.
    """
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf

    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokenize_udf(do_stem=stem)(F.col(text_col)).alias("toks"),
    )
    w = F.broadcast(model.weights) if broadcast_model else model.weights
    per_tok = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .join(w, "term", "left")
        .crossJoin(F.broadcast(model.consts.select("oov_llr")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum(F.coalesce(F.col("llr"), F.col("oov_llr"))).alias("tok_llr"),
        )
    )
    out = (
        toks.select("doc_id")
        .join(per_tok, "doc_id", "left")
        .crossJoin(F.broadcast(model.consts.select("prior_llr")))
        .select(
            "doc_id",
            F.coalesce("n_toks", F.lit(0)).cast("long").alias("n_toks"),
            (F.col("prior_llr") + F.coalesce("tok_llr", F.lit(0.0))).alias("_s"),
        )
    )
    return out.select(
        "doc_id",
        "n_toks",
        F.round("_s", 4).alias("nb_llr"),
        (F.col("_s") > 0).cast("int").alias("pred"),
    )
