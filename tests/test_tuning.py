"""BM25 grid sweep: shared-probe evaluation matches per-point searches, and
the grid discriminates on a corpus built to punish bad length normalization."""

from __future__ import annotations

import pytest

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.operators.index_build import build_index
from fulltextsearch_spark.operators.query import search
from fulltextsearch_spark.operators.rankeval import rank_eval
from fulltextsearch_spark.operators.tuning import sweep_bm25


@pytest.fixture(scope="module")
def setup(spark):
    # short on-topic docs vs long padded docs mentioning the term once:
    # b=0 (no length normalization) ranks the padded docs too high, so the
    # grid must discriminate.
    # identical tf everywhere: only LENGTH separates relevant from padded,
    # and padded docs carry the LOWER ids so the doc_id tiebreak cannot
    # rescue the b=0 (no length normalization) setting.
    rows = []
    for i in range(28):
        rows.append((i, "quantum relay " + " ".join(f"fill{i}x{j}" for j in range(120))))
    for i in range(28, 40):
        rows.append((i, "quantum relay core " + " ".join(f"pad{j}" for j in range(3))))
    for i in range(40, 60):
        rows.append((i, " ".join(f"noise{i}y{j}" for j in range(30))))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    cfg = EngineConfig(k1=1.2, b=0.75, k=10, stem=False)
    idx = build_index(spark, docs, cfg, persist=False)
    queries = spark.createDataFrame([("q1", "quantum relay")], ["query_id", "content"])
    # judgments: the short on-topic docs are the relevant ones
    qrels = spark.createDataFrame(
        [("q1", i, 2.0) for i in range(28, 40)],
        "query_id STRING, doc_id LONG, rel DOUBLE",
    )
    return docs, cfg, idx, queries, qrels


GRID = [(1.2, 0.0), (1.2, 0.75), (0.2, 0.75)]


def test_sweep_matches_per_point_rank_eval(spark, setup):
    _, cfg, idx, queries, qrels = setup
    got = {
        (r["k1"], r["b"]): (r["ndcg"], r["mrr"], r["precision"])
        for r in sweep_bm25(idx, queries, qrels, GRID, cfg).collect()
    }
    assert set(got) == set(GRID)
    for k1, b in GRID:
        c = EngineConfig(k1=k1, b=b, k=10, stem=False)
        run = search(idx, queries, c)
        ev = rank_eval(run, qrels, k=10).collect()
        want = (
            round(sum(r["ndcg"] for r in ev) / len(ev), 4),
            round(sum(r["mrr"] for r in ev) / len(ev), 4),
            round(sum(r["precision"] for r in ev) / len(ev), 4),
        )
        assert got[(k1, b)] == pytest.approx(want, abs=1e-4), (k1, b)


def test_sweep_discriminates_length_normalization(spark, setup):
    _, cfg, idx, queries, qrels = setup
    got = {
        (r["k1"], r["b"]): r["ndcg"]
        for r in sweep_bm25(idx, queries, qrels, GRID, cfg).collect()
    }
    # with b=0.75 the short on-topic docs win; b=0 lets padded docs crowd in
    assert got[(1.2, 0.75)] > got[(1.2, 0.0)]


def test_sweep_rejects_empty_grid(spark, setup):
    _, cfg, idx, queries, qrels = setup
    with pytest.raises(ValueError):
        sweep_bm25(idx, queries, qrels, [], cfg)
