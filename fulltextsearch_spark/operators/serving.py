"""Low-latency query serving over a persisted compressed index.

:func:`fulltextsearch_spark.operators.wand.search_wand` tokenizes queries in
a Spark job and joins the live postings lineage — the right shape for large
offline query batches. At *serving* time (a handful of queries against a hot
on-disk index, the reference's interactive loop
``/root/reference/src/queries/query_iterator.cpp:34-51`` +
``src/main.cpp:64-86``) the fixed per-job overhead dominates. This module is
the serving path:

* queries tokenize on the DRIVER — a query is tiny by definition (the
  reference reads one line at a time), so this is not a collect-style
  anti-pattern; it is what turns the term set into a *static* predicate;
* the needed terms become a ``term IN (...)`` filter that *pushes into the
  parquet scan* — the index writer clusters rows by term
  (``save_compressed_index`` repartition+sortWithinPartitions), so footer
  min/max statistics skip every row group without a matching term. The scan
  reads O(query terms) row groups out of the whole index;
* one job broadcast-joins the tiny (query_id, term, qtf) frame and runs the
  same block-max MaxScore kernel — results are byte-identical to
  ``search_wand`` (pinned by tests/test_serving.py).

At 100 TB the index is TBs of parquet; this plan still reads only the row
groups containing the queried terms, which is why serving latency is
independent of corpus size (modulo posting-list length).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fulltextsearch_spark.config import DEFAULT_CONFIG, EngineConfig
from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.wand import topk_from_joined

__all__ = ["QueryServer"]


@dataclass
class QueryServer:
    """Hot handle on a saved index (``save_compressed_index`` layout)."""

    spark: SparkSession
    root: str
    n_docs: int
    avgdl: float
    block_size: int
    k1: float
    b: float

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "QueryServer":
        stats = spark.read.parquet(f"{root}/corpus_stats").collect()[0]
        return cls(
            spark=spark,
            root=root,
            n_docs=int(stats["n_docs"]),
            avgdl=float(stats["avgdl"]),
            block_size=int(stats["block_size"]),
            k1=float(stats["k1"]),
            b=float(stats["b"]),
        )

    def search(
        self,
        queries: list[tuple[str, str]],
        cfg: EngineConfig = DEFAULT_CONFIG,
        scoring: str = "bm25",
        k: int | None = None,
    ) -> DataFrame:
        """[(query_id, content)] -> (query_id, rank, doc_id, score).

        Rank-identical to ``search_wand`` over the loaded index.
        """
        if scoring == "bm25" and (cfg.k1 != self.k1 or cfg.b != self.b):
            raise ValueError(
                f"index built with (k1={self.k1}, b={self.b}); query config "
                f"has (k1={cfg.k1}, b={cfg.b}) — rebuild or re-encode"
            )
        rows = []
        for qid, content in queries:
            for term, qtf in Counter(tokenize(content, cfg.stem)).items():
                rows.append((qid, term, qtf))
        terms = sorted({t for _, t, _ in rows})
        q_df = self.spark.createDataFrame(
            rows or [("", "", 0)], "query_id STRING, term STRING, qtf LONG"
        )
        if not rows:
            q_df = q_df.limit(0)
        # the static IN-filter is what reaches the parquet footers; the join
        # alone would not prune the scan
        postings = self.spark.read.parquet(f"{self.root}/postings").where(
            F.col("term").isin(terms) if terms else F.lit(False)
        )
        joined = postings.join(F.broadcast(q_df), "term", "inner")
        return topk_from_joined(
            joined,
            self.n_docs,
            self.avgdl,
            k if k is not None else cfg.k,
            scoring,
            cfg.k1,
            cfg.b,
            self.block_size,
        )
