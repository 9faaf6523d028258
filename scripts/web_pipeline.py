"""End-to-end web pipeline demo: WARC bytes -> searchable index.

Composes the engine's stages the way a production crawl-to-search DAG
would, printing per-stage row counts and a final query result:

  1. WARC segments        sources/warc.parse_warc (Content-Length framing)
  2. HTML -> text         operators/extract.extract_pages (codegen regex)
  3. URL curation         urltools.url_dedup (normalize + keep-first)
  4. Quality gates        webfilters.gopher_quality + c4_line_filters
  5. Exact dedup          curation canonicalization (md5 keep-first)
  6. Near-dup dedup       dedup.minhash_lsh_pairs -> connected_components
  7. Dense ids + index    ingest.assign_dense_doc_ids -> compressed build
  8. Query                wand.search_wand (block-max MaxScore)

Usage: python scripts/web_pipeline.py [n_docs] [query...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    query = " ".join(sys.argv[2:]) or "cat salmon fresh"

    from pyspark.sql import functions as F

    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.operators.compressed_index import build_compressed_index
    from fulltextsearch_spark.operators.dedup import (
        cluster_keys,
        minhash_lsh_pairs,
    )
    from fulltextsearch_spark.operators.extract import extract_pages
    from fulltextsearch_spark.operators.urltools import url_dedup
    from fulltextsearch_spark.operators.wand import search_wand
    from fulltextsearch_spark.operators.webfilters import gopher_quality
    from fulltextsearch_spark.session import get_spark
    from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids
    from fulltextsearch_spark.sources.warc import parse_warc, synth_warc_records
    from fulltextsearch_spark.sources.webpages import generate_webpages

    spark = get_spark(app_name="web-pipeline", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def stage(name, df):
        n = df.count()
        print(f"{name:28s} {n:8d} rows")
        return df

    # 0-1: crawl segments (synthesized here; binaryFile reads in production)
    pages0 = generate_webpages(spark, n_docs, seed=7, num_partitions=8)
    warc = stage("warc segments", synth_warc_records(pages0))
    pages = stage("parsed responses", parse_warc(warc))

    # 2: boilerplate strip
    pages = stage("extracted text", extract_pages(pages, out_col="text"))

    # 3: URL curation (keep-first per normalized URL). Provisional ids are
    # 64-bit xxhash64 of the url — collision odds ~n^2/2^65, vs the 32-bit
    # F.hash whose birthday bound already bites at ~10^5 pages.
    with_ids = pages.withColumn(
        "doc_id", F.abs(F.xxhash64("url")).cast("long")
    )
    kept_urls = url_dedup(with_ids).where(F.col("keep") == 1).select("doc_id")
    pages = stage(
        "after url dedup", with_ids.join(kept_urls, "doc_id", "left_semi")
    )

    # 4: quality gates (Gopher A1.1)
    q = gopher_quality(pages.select("doc_id", "text"))
    good = q.where(F.col("passes") == 1).select("doc_id")
    pages = stage("after gopher quality", pages.join(good, "doc_id", "left_semi"))

    # 5-6: exact + near-dup dedup (MinHash -> connected components, keep min)
    exact_keep = (
        pages.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    pages = stage("after exact dedup", pages.join(exact_keep, "doc_id", "left_semi"))
    prs = minhash_lsh_pairs(
        pages.select("doc_id", "text"), threshold=0.9, shingle_k=8
    )
    if prs.take(1):
        keys = cluster_keys(pages, prs)
        keep = keys.where(F.col("doc_id") == F.col("key")).select("doc_id")
        pages = pages.join(keep, "doc_id", "left_semi")
    pages = stage("after near-dup dedup", pages)

    # 7: dense ids + compressed block-max index
    corpus = assign_dense_doc_ids(pages.select("url", "text"), order_col="url")
    cfg = EngineConfig(k1=1.2, b=0.75, k=10, stem=True)
    cidx = build_compressed_index(spark, corpus, cfg)
    stage("index terms", cidx.postings)

    # 8: query
    qdf = spark.createDataFrame([("q", query)], ["query_id", "content"])
    res = search_wand(cidx, qdf, cfg)
    print(f"\ntop-10 for {query!r}:")
    hits = res.join(corpus.select("doc_id", "url"), "doc_id").orderBy("rank")
    for r in hits.collect():
        print(f"  {r['rank']:2d}. doc {r['doc_id']:6d} {r['score']:.4f}  {r['url']}")
    spark.stop()


if __name__ == "__main__":
    main()
