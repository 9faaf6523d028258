"""BM25F: multi-field ranking (title / body / anchor-style fields).

The reference engine scores one text stream (bm25.cpp:11-27); real web
search ranks FIELDS with different weights — title hits matter more than
body hits (Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework: BM25 and Beyond", §3.3 "simple BM25F"):

    tf~(t,d) = sum_f  w_f * tf_f(t,d) / (1 - b_f + b_f * len_f(d)/avglen_f)
    score(q,d) = sum_t qtf(t) * idf(t) * tf~(t,d) / (k1 + tf~(t,d))

i.e. per-field length normalization and field weight FIRST, one shared
saturation (k1) afterwards — NOT a weighted sum of per-field BM25 scores
(that would double-saturate; the distinction is the whole point of BM25F).
idf is document-level: df(t) counts docs containing t in ANY field, through
the same idf form the engine uses everywhere (scoring.py, reference
bm25.cpp:18-20), and qtf keeps the engine's duplicate-query-token
multiplicity (inverted_index_engine.cpp:119-135).

Plan shape mirrors the single-field engine: per-field tokenize is map-only,
the posting build is one groupBy on (term, field, doc), per-(doc, field)
lengths are DENORMALIZED into the postings (the same J2 trade the reference
makes for dl), queries broadcast, and the only query-time wide op is the
per-(query, doc) sum. avglen_f divides by N = max(doc_id)+1 (engine A4/A5
semantics — empty fields count in the average).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fulltextsearch_spark.functions.tokenizer import tokenize_udf
from fulltextsearch_spark.operators.query import query_terms, topk

__all__ = ["FieldedIndex", "build_fielded_index", "bm25f_topk"]


@dataclass(frozen=True)
class FieldedIndex:
    postings: DataFrame  # (term, field, doc_id, tf, flen)
    df_table: DataFrame  # (term, df) — docs containing term in ANY field
    avg_len: dict[str, float]  # field -> sum(len_f)/n_docs
    n_docs: int
    stem: bool


def build_fielded_index(
    docs: DataFrame, fields: dict[str, str], stem: bool = False
) -> FieldedIndex:
    """``fields`` maps field name -> column of ``docs``. Each field runs
    through the engine tokenizer; postings carry the per-(doc, field)
    length denormalized. ``docs`` must carry ``doc_id``."""
    if not fields:
        raise ValueError("need at least one field")
    tok = tokenize_udf(do_stem=stem)
    parts = []
    for fname, col in fields.items():
        toked = docs.select(
            "doc_id", F.lit(fname).alias("field"), tok(F.col(col)).alias("_toks")
        )
        parts.append(
            toked.select(
                "doc_id", "field", F.size("_toks").alias("flen"),
                F.explode_outer("_toks").alias("term"),
            )
        )
    exploded = parts[0]
    for p in parts[1:]:
        exploded = exploded.unionByName(p)
    postings = (
        exploded.filter(F.col("term").isNotNull())
        .groupBy("term", "field", "doc_id", "flen")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_table = postings.groupBy("term").agg(
        F.count_distinct("doc_id").cast("long").alias("df")
    )
    stats = docs.agg((F.max("doc_id") + 1).alias("n")).collect()[0]
    n_docs = int(stats["n"])
    lens = (
        exploded.select("doc_id", "field", "flen")
        .distinct()
        .groupBy("field")
        .agg(F.sum("flen").alias("total"))
        .collect()
    )
    avg_len = {r["field"]: float(r["total"]) / n_docs for r in lens}
    return FieldedIndex(
        postings=postings, df_table=df_table, avg_len=avg_len,
        n_docs=n_docs, stem=stem,
    )


def bm25f_topk(
    index: FieldedIndex,
    queries: DataFrame,
    weights: dict[str, float],
    field_b: dict[str, float] | None = None,
    k1: float = 1.2,
    k: int = 10,
) -> DataFrame:
    """queries(query_id, content) -> (query_id, rank, doc_id, score)."""
    missing = set(index.avg_len) - set(weights)
    if missing:
        raise ValueError(f"weights missing for fields {sorted(missing)}")
    field_b = field_b or {}
    q_terms = query_terms(queries, stem=index.stem)

    w_col = F.lit(None).cast("double")
    b_col = F.lit(None).cast("double")
    avg_col = F.lit(None).cast("double")
    for fname in index.avg_len:
        cond = F.col("field") == fname
        w_col = F.when(cond, F.lit(float(weights[fname]))).otherwise(w_col)
        b_col = F.when(cond, F.lit(float(field_b.get(fname, 0.75)))).otherwise(b_col)
        avg_col = F.when(cond, F.lit(index.avg_len[fname])).otherwise(avg_col)

    joined = index.postings.join(F.broadcast(q_terms), "term", "inner")
    # per-field weighted, length-normalized tf, then sum over fields
    contrib = (
        w_col
        * F.col("tf").cast("double")
        / (F.lit(1.0) - b_col + b_col * F.col("flen").cast("double") / avg_col)
    )
    wtf = joined.groupBy("query_id", "qtf", "term", "doc_id").agg(
        F.sum(contrib).alias("wtf")
    )
    n = float(index.n_docs)
    idf = F.log(
        (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)
    )
    per_term = wtf.join(F.broadcast(index.df_table), "term").select(
        "query_id",
        "doc_id",
        (
            F.col("qtf").cast("double")
            * idf
            * F.col("wtf")
            / (F.lit(float(k1)) + F.col("wtf"))
        ).alias("_s"),
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(F.sum("_s").alias("score"))
    return topk(scored, k)
