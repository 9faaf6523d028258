#!/usr/bin/env python3
"""Export the synthetic web corpus to the reference harness's binary format.

Format: [uint32 n][uint32 len x n][doc bytes...], docs sorted by url so the
implicit ids 0..n-1 equal the Spark engine's dense url-ordered doc_ids
(byte-identical text per id — the per-row invariant of the driver contract).
Also writes the reference query set one per line.
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/fts_bench_cache")
    src = os.path.join(cache, f"webspark{docs}")
    out = f"/tmp/ref_build/corpus{docs}.bin"
    _write_queries()
    if os.path.exists(out):
        return
    if not os.path.isdir(src):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from scaling_bench import ensure_corpus  # noqa: PLC0415

        src = ensure_corpus(docs)

    tbl = pq.read_table(src, columns=["url", "text"]).sort_by("url")
    texts = tbl.column("text").combine_chunks()
    if isinstance(texts, pa.ChunkedArray):
        texts = pa.concat_arrays(texts.chunks)
    data = [t.as_py().encode() for t in texts]
    lens = np.array([len(d) for d in data], dtype=np.uint32)
    with open(out, "wb") as f:
        f.write(struct.pack("<I", len(data)))
        f.write(lens.tobytes())
        for d in data:
            f.write(d)

    print(f"exported {len(data)} docs -> {out}")


def _write_queries() -> None:
    from fulltextsearch_spark.sources.webpages import QUERY_SET  # noqa: PLC0415

    with open("/tmp/ref_build/queries.txt", "w") as f:
        for _qid, content in QUERY_SET:
            f.write(content + "\n")


if __name__ == "__main__":
    main()
