"""Link-graph analysis: PageRank over a web link graph.

Web-scale retrieval ranks with link signals alongside text (the classic
complement to BM25 — Brin & Page 1998); a 10^12-page corpus's link graph
is exactly the iterative-DataFrame workload Spark's execution model is
built for. Standard Google formulation with uniform teleport and dangling
mass redistributed uniformly:

    r_{k+1}(v) = (1-d)/N + d * ( sum_{u->v} r_k(u)/outdeg(u) + D_k/N )

where D_k = sum of r_k over dangling (no-outlink) nodes. Fixed iteration
count, no convergence test — determinism is what lets the driver oracle
unroll the same iterations in SQL and hash-match the result.

Scale shape per iteration: one join of the rank vector (skinny: id,
double) with the edge list on src — partition both on the join key once
and every iteration reuses the co-location — one groupBy(dst) for the
contributions, and one scalar aggregate for the dangling mass. Lineage is
truncated every few iterations with localCheckpoint (same pattern as
connected_components, operators/dedup.py) so the plan doesn't grow
linearly with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["anchor_texts", "hits", "label_propagation", "pagerank"]


def pagerank(
    edges: DataFrame,
    n_docs: int,
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 4,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """edges(src, dst) -> (doc_id, pagerank) after ``iters`` power steps.

    Vertices are ids 0..n_docs-1 (docs absent from the edge list still
    rank: they hold teleport + dangling mass). Parallel edges should be
    de-duplicated by the caller if unwanted — each contributes separately,
    like repeated links on a page.

    ``seeds`` switches to PERSONALIZED PageRank (Haveliwala, WWW 2002 /
    the random-walk-with-restart form): the teleport vector becomes
    uniform over the seed doc_ids instead of the whole graph, dangling
    mass restarts at the seeds, and ranks initialize from the seed
    distribution — scores then measure proximity TO the seed set (the
    "more like these trusted pages" authority prior; TrustRank is exactly
    this with a curated seed list). The seed frame must be small (it is
    re-broadcast into each iteration's rank update); non-seed vertices
    rank only through incoming paths.
    """
    spark = edges.sparkSession
    d = float(damping)
    n = float(n_docs)
    deg = edges.groupBy("src").agg(F.count("*").cast("double").alias("_deg"))
    edges_deg = edges.join(deg, "src").select("src", "dst", "_deg")
    # one partitioning, reused by every iteration's join
    edges_deg = edges_deg.repartition("src").persist()
    edges_deg.count()
    linked = deg.select(F.col("src").alias("doc_id"))

    if seeds is not None:
        seed_ids = seeds.select(F.col("doc_id").cast("long").alias("doc_id")).distinct()
        n_seeds = seed_ids.count()
        if n_seeds == 0:
            raise ValueError("personalized pagerank needs a non-empty seed set")
        pvec = (
            spark.range(n_docs)
            .select(F.col("id").alias("doc_id"))
            .join(F.broadcast(seed_ids.withColumn("_s", F.lit(1))), "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("_s").isNotNull(), F.lit(1.0 / n_seeds))
                .otherwise(F.lit(0.0))
                .alias("p"),
            )
            .localCheckpoint()
        )
        ranks = pvec.select("doc_id", F.col("p").alias("r"))
        for i in range(iters):
            dangling = (
                ranks.join(linked, "doc_id", "left_anti").agg(F.sum("r")).collect()[0][0]
                or 0.0
            )
            contribs = (
                edges_deg.join(ranks, edges_deg["src"] == ranks["doc_id"])
                .select("dst", (F.col("r") / F.col("_deg")).alias("_c"))
                .groupBy("dst")
                .agg(F.sum("_c").alias("_contrib"))
            )
            ranks = (
                pvec.join(contribs, F.col("doc_id") == F.col("dst"), "left")
                .select(
                    "doc_id",
                    (
                        F.lit(1.0 - d) * F.col("p")
                        + F.lit(d)
                        * (
                            F.coalesce(F.col("_contrib"), F.lit(0.0))
                            + F.lit(dangling) * F.col("p")
                        )
                    ).alias("r"),
                )
            )
            if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
                ranks = ranks.localCheckpoint()
        out = ranks.select("doc_id", F.col("r").alias("pagerank")).localCheckpoint()
        edges_deg.unpersist()
        return out

    ranks = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.lit(1.0 / n).alias("r")
    )
    for i in range(iters):
        dangling = (
            ranks.join(linked, "doc_id", "left_anti").agg(F.sum("r")).collect()[0][0]
            or 0.0
        )
        contribs = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["doc_id"])
            .select("dst", (F.col("r") / F.col("_deg")).alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_contrib"))
        )
        ranks = (
            spark.range(n_docs)
            .select(F.col("id").alias("doc_id"))
            .join(contribs, F.col("doc_id") == F.col("dst"), "left")
            .select(
                "doc_id",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d)
                    * (F.coalesce(F.col("_contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint()
    # cut the final lineage before dropping the cached edges (the returned
    # frame must not re-derive from the unpersisted join input)
    out = ranks.select("doc_id", F.col("r").alias("pagerank")).localCheckpoint()
    edges_deg.unpersist()
    return out


def hits(
    edges: DataFrame,
    n_docs: int,
    iters: int = 10,
) -> DataFrame:
    """edges(src, dst) -> (doc_id, hub, authority): Kleinberg's HITS after
    ``iters`` mutual-reinforcement steps, L2-normalized each half-step —
    the hub/authority complement to :func:`pagerank` (Kleinberg, JACM
    1999). Fixed iteration count for the same determinism reason.

    Per iteration: two skinny joins of the score vector with the edge
    list (reusing one persisted partitioning) + two groupBy aggregates +
    two scalar norms; nodes without in/out links hold score 0 after the
    first step. Every half-step eagerly localCheckpoints its raw sums so
    the norm collects never replay prior iterations.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").repartition("src").persist()
    e.count()
    init = 1.0 / (float(n_docs) ** 0.5)
    hubs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.lit(init).alias("h")
    )
    auths = None
    for i in range(iters):
        # eager localCheckpoint: the norm collect below would otherwise
        # recompute the whole growing lineage, making iteration k cost
        # O(k) recomputes (observed 4 min for a 6-node graph) — with the
        # checkpoint every half-step is O(1) over a 1-row-per-node frame
        a_raw = (
            e.join(hubs, e["src"] == hubs["doc_id"])
            .groupBy("dst")
            .agg(F.sum("h").alias("_a"))
            .localCheckpoint()
        )
        an = float(
            a_raw.agg(F.sqrt(F.sum(F.col("_a") * F.col("_a")))).collect()[0][0] or 1.0
        ) or 1.0
        auths = (
            spark.range(n_docs)
            .select(F.col("id").alias("doc_id"))
            .join(a_raw, F.col("doc_id") == F.col("dst"), "left")
            .select(
                "doc_id",
                (F.coalesce(F.col("_a"), F.lit(0.0)) / F.lit(an)).alias("a"),
            )
        )
        h_raw = (
            e.join(auths, e["dst"] == auths["doc_id"])
            .groupBy("src")
            .agg(F.sum("a").alias("_h"))
            .localCheckpoint()
        )
        hn = float(
            h_raw.agg(F.sqrt(F.sum(F.col("_h") * F.col("_h")))).collect()[0][0] or 1.0
        ) or 1.0
        hubs = (
            spark.range(n_docs)
            .select(F.col("id").alias("doc_id"))
            .join(h_raw, F.col("doc_id") == F.col("src"), "left")
            .select(
                "doc_id",
                (F.coalesce(F.col("_h"), F.lit(0.0)) / F.lit(hn)).alias("h"),
            )
        )
    out = (
        hubs.join(auths, "doc_id")
        .select("doc_id", F.col("h").alias("hub"), F.col("a").alias("authority"))
        .localCheckpoint()
    )
    e.unpersist()
    return out


def label_propagation(
    edges: DataFrame,
    n_docs: int,
    iters: int = 5,
) -> DataFrame:
    """edges(src, dst) -> (doc_id, community): synchronous label
    propagation (Raghavan et al. 2007) with a fully deterministic update —
    each round every node adopts the label most frequent among its
    neighbors (ties -> smallest label); isolated nodes keep their own.
    Labels start as node ids. Fixed iteration count and a total tie-break
    make the output a pure (integer!) function of the graph, hence
    SQL-replayable; synchronous updates can oscillate on bipartite
    structures — the standard caveat of the synchronous variant (as in
    GraphFrames' LPA) — which a fixed iteration count turns into a
    deterministic snapshot rather than a hang.

    Per round: one join of the label table with the symmetrized edge list
    + one (node, label) count aggregate + one rank-1 window; label tables
    are localCheckpoint-truncated exactly like pagerank/HITS so round k
    never replays rounds 0..k-1.
    """
    spark = edges.sparkSession
    sym = (
        edges.select(F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v"))
        .unionByName(
            edges.select(
                F.col("dst").cast("long").alias("u"), F.col("src").cast("long").alias("v")
            )
        )
        .distinct()
        .repartition("v")
        .persist()
    )
    sym.count()
    labels = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.col("id").alias("lbl")
    )
    from pyspark.sql import Window as _W  # noqa: PLC0415

    w = _W.partitionBy("u").orderBy(F.desc("_n"), F.asc("lbl"))
    for _ in range(iters):
        votes = (
            sym.join(labels, sym["v"] == labels["doc_id"])
            .groupBy("u", "lbl")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        winner = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("u").alias("doc_id"), F.col("lbl").alias("_new"))
        )
        labels = (
            spark.range(n_docs)
            .select(F.col("id").alias("doc_id"))
            .join(labels.select("doc_id", "lbl"), "doc_id")
            .join(winner, "doc_id", "left")
            .select("doc_id", F.coalesce("_new", "lbl").alias("lbl"))
            .localCheckpoint()
        )
    out = labels.select("doc_id", F.col("lbl").alias("community")).localCheckpoint()
    sym.unpersist()
    return out


def anchor_texts(
    docs: DataFrame,
    edges: DataFrame,
    n_words: int = 3,
    max_anchors: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, anchor) — each page's incoming anchor text, the classic
    web-ranking field (Brin & Page 1998 §2.2; Craswell et al. SIGIR'01
    showed anchor text beats body text for navigational queries).

    Real crawls carry per-link anchor strings; this derives a
    deterministic stand-in — the first ``n_words`` whitespace words of the
    SOURCE page — so the aggregation shape is real while the text source
    is synthesizable in tests and oracles. Per target, anchors concatenate
    in ascending-src order, capped at the ``max_anchors`` lowest src ids:
    the cap bounds the per-row state under power-law in-degree (the
    popular-page row would otherwise hold the whole crawl's anchors) and
    is the standard anchor-index truncation. Pages with no in-links get no
    row (callers coalesce to '').

    Scale shape: one src-keyed join steers each edge to its source text
    (only the anchor words survive the projection), one dst-keyed window +
    aggregate with WindowGroupLimit keeping ``max_anchors`` rows per
    target before the exchange.
    """
    from pyspark.sql import Window

    if max_anchors < 1 or n_words < 1:
        raise ValueError("n_words and max_anchors must be >= 1")
    a = F.array_join(F.slice(F.split(F.col(text_col), " "), 1, n_words), " ")
    per_edge = edges.join(
        docs.select(F.col("doc_id").alias("src"), F.col(text_col)), "src"
    ).select("dst", "src", a.alias("a"))
    w = Window.partitionBy("dst").orderBy("src")
    capped = per_edge.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= max_anchors
    )
    return (
        capped.groupBy("dst")
        .agg(F.sort_array(F.collect_list(F.struct("src", "a"))).alias("_s"))
        .select(
            F.col("dst").alias("doc_id"),
            F.array_join(F.transform("_s", lambda s: s["a"]), " ").alias("anchor"),
        )
    )
