"""BPE tokenizer training: learn byte-pair-encoding merge rules from the
corpus (Sennrich et al., ACL 2016) — the tokenizer-induction step of a
training-data pipeline, Spark-first.

The key scale property of classic BPE training: after ONE corpus-scale
aggregate (the word-frequency table — the same shuffle shape as the tf
table), every merge round operates on the WORD TABLE (vocabulary-sized,
millions of rows at web scale, not trillions), never the corpus again.
Each round is: explode each word's current symbol sequence into weighted
adjacent pairs -> one map-side-partial hash aggregate -> argmax (a 1-row
driver collect) -> rewrite the symbol sequences (Arrow-batched, left-to-
right non-overlapping, the reference BPE semantics). n_merges rounds cost
n_merges small-table passes; the corpus is read once.

Determinism: word counts are exact integers, the argmax tie-breaks on
(count desc, left asc, right asc), and the rewrite rule is positional —
the merge table is a pure function of the corpus, which is what makes the
driver's SQL oracle possible (each round replays in DuckDB via a
doubled-separator string replace that reproduces the left-to-right
non-overlap rule exactly).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fulltextsearch_spark.functions.tokenizer import tokenize_udf

__all__ = ["train_bpe", "bpe_encode", "END_MARK"]

# word-final marker symbol (its own symbol, not a suffix); '_' never occurs
# inside engine tokens (it is a delimiter in the 67-char split whitelist)
END_MARK = "_"


def _merge_once(syms: list[str], left: str, right: str) -> list[str]:
    """Left-to-right non-overlapping merge of (left, right) -> left+right."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _driver_merges(
    word_counts: list[tuple[str, int]], n_merges: int, end_mark: bool
) -> list[tuple[int, str, str, int]]:
    """In-process merge loop over a collected word table — bit-identical
    semantics to the distributed loop (same counting convention, same
    (count desc, lhs, rhs) argmax, same rewrite)."""
    table: list[tuple[list[str], int]] = [
        (list(w) + ([END_MARK] if end_mark else []), int(c)) for w, c in word_counts
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        stats: dict[tuple[str, str], int] = {}
        for syms, c in table:
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + c
        if not stats:
            break
        (left, right), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, cnt))
        table = [(_merge_once(s, left, right), c) for s, c in table]
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    end_mark: bool = True,
    driver_vocab_limit: int = 200_000,
) -> DataFrame:
    """-> (merge_rank, lhs, rhs, pair_count): the learned merge table.

    ``merge_rank`` is 1-based merge order; ``pair_count`` is the weighted
    adjacent-pair count (all occurrences, overlaps included — the
    reference get_stats convention) at the time the pair won. Stops early
    if no adjacent pair remains. Words tokenize through the engine's
    unstemmed analyzer; with ``end_mark`` each word carries a final ``_``
    symbol so merges can distinguish word-final units.

    When the distinct-word table fits the driver (``<= driver_vocab_limit``
    rows — the :func:`~.similarity._bounded_sample` pattern; every real
    BPE trainer is single-node over the word table), the merge loop runs
    in-process after the one distributed aggregate, saving ~2 Spark jobs
    per round. The distributed small-table loop remains the unbounded-
    vocabulary path (force it with ``driver_vocab_limit=0``) and computes
    the identical table by construction.
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokenize_udf(do_stem=False)(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    if driver_vocab_limit > 0:
        head = words.limit(driver_vocab_limit + 1).collect()
        if len(head) <= driver_vocab_limit:
            merges = _driver_merges(
                [(r["w"], r["cnt"]) for r in head], n_merges, end_mark
            )
            return spark.createDataFrame(
                merges, "merge_rank LONG, lhs STRING, rhs STRING, pair_count LONG"
            )

    def _init(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            syms = [
                list(w) + ([END_MARK] if end_mark else []) for w in pdf["w"]
            ]
            yield pd.DataFrame({"syms": syms, "cnt": pdf["cnt"]})

    table = words.mapInPandas(_init, schema="syms ARRAY<STRING>, cnt LONG").persist()
    table.count()  # materialize before the loop

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        n = F.size("syms")
        pairs = (
            table.where(n >= 2)
            .select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, n - 1).alias("l"),
                        F.slice("syms", 2, n - 1).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
        )
        best = pairs.orderBy(F.desc("c"), "l", "r").limit(1).collect()
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, left, right, cnt))

        def _rewrite(
            batches: Iterator[pd.DataFrame], _l: str = left, _r: str = right
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                yield pd.DataFrame(
                    {
                        "syms": [_merge_once(list(s), _l, _r) for s in pdf["syms"]],
                        "cnt": pdf["cnt"],
                    }
                )

        new_table = table.mapInPandas(
            _rewrite, schema="syms ARRAY<STRING>, cnt LONG"
        ).persist()
        new_table.count()
        table.unpersist()
        table = new_table
    table.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank LONG, lhs STRING, rhs STRING, pair_count LONG"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    end_mark: bool = True,
) -> DataFrame:
    """-> (doc_id, n_bpe_tokens, bpe_tokens): segment each doc's token
    stream with a learned merge list (applied in rank order, each merge
    left-to-right non-overlapping — the reference apply_bpe semantics).

    The merge list is tokenizer-sized (tens of thousands of rules), so it
    broadcasts with the kernel closure; encoding is one Arrow pass over
    the corpus, zero shuffles. ``bpe_tokens`` is the flattened symbol
    stream in document order (word-final units carry the ``_`` mark).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    rules = [(l, r) for l, r in merges]

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from fulltextsearch_spark.functions.tokenizer import (  # noqa: PLC0415
            tokenize,
        )

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_tokens = []
            for text in pdf[text_col]:
                stream: list[str] = []
                for w in tokenize(text if isinstance(text, str) else "", do_stem=False):
                    seg = cache.get(w)
                    if seg is None:
                        syms = list(w) + ([END_MARK] if end_mark else [])
                        for l, r in rules:
                            syms = _merge_once(syms, l, r)
                        cache[w] = seg = syms
                    stream.extend(seg)
                out_tokens.append(stream)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bpe_tokens": [len(t) for t in out_tokens],
                    "bpe_tokens": out_tokens,
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        _encode, schema="doc_id LONG, n_bpe_tokens LONG, bpe_tokens ARRAY<STRING>"
    )
