"""Stateful streaming operators: sessionization and watermarked term windows.

Completes the streaming surface next to the incremental indexer
(:mod:`.incremental`): that module is exactly-once micro-batch *ingestion*;
these are the continuous-query side — a custom per-key stateful operator
(``applyInPandasWithState``) and a watermarked event-time windowed
aggregate, the two Structured-Streaming patterns a clickstream/query-log
pipeline runs 24/7 next to the index.

Scale shape: both keep state bounded — sessionization holds O(1) state per
active key (last-seen ts, open-session accumulator), the windowed count
holds only windows newer than the watermark; Spark's state store shards by
key hash across executors, so neither has a single-task concentration
point.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_dedup_first", "streaming_sessionize", "windowed_term_counts"]

_OUT_SCHEMA = (
    "user_id BIGINT, session_start_us BIGINT, session_end_us BIGINT, "
    "n_events BIGINT"
)
_STATE_SCHEMA = "last_ts_us BIGINT, sess_start_us BIGINT, n_events BIGINT"


def _session_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, sess_start, n = state.get
        else:
            last_ts, sess_start, n = None, None, 0
        closed: list[tuple] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        # integer microseconds, robust to ns/us units and tz-aware dtypes
        ts_us = (
            pd.to_datetime(rows["ts"], utc=True)
            .dt.tz_localize(None)
            .to_numpy()
            .astype("datetime64[us]")
            .astype("int64")
        )
        for t in ts_us.tolist():
            if last_ts is None:
                sess_start, n = t, 1
            elif t - last_ts > gap_us:
                closed.append((user_id, sess_start, last_ts, n))
                sess_start, n = t, 1
            else:
                n += 1
            last_ts = t
        state.update((last_ts, sess_start, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us", "session_end_us",
                         "n_events"],
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_s: float = 1800.0,
) -> DataFrame:
    """Continuous sessionization of an event stream via per-key state.

    ``events`` is a STREAMING DataFrame with ``(user_id, event_id, ts)``.
    A session closes when the same user's next event arrives more than
    ``gap_s`` after the previous one; closed sessions are emitted as
    ``(user_id, session_start_us, session_end_us, n_events)``. The open
    tail session stays in the per-key state store (O(1) per active user)
    until a later event closes it — the standard streaming-sessionization
    contract; production deployments add an event-time timeout to also
    flush sessions closed by silence (upgrade path:
    ``GroupStateTimeout.EventTimeTimeout`` + ``state.setTimeoutTimestamp``).

    Batch parity: within delivered events, session boundaries equal
    :func:`fulltextsearch_spark.operators.temporal.sessionize` (pinned in
    tests/test_streaming_sessions.py).
    """
    gap_us = int(gap_s * 1_000_000)
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_us),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_term_counts(
    docs: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
    stem: bool = False,
) -> DataFrame:
    """Watermarked event-time windowed term counts over a document stream.

    The trending-terms query: tokenize with the engine tokenizer, count per
    (event-time window, term), emit each window exactly once when the
    watermark passes its end (append-mode finalization). Late-data
    contract as Spark implements it: windows are EVICTED at batch end once
    the watermark passes; a late row arriving after its window's eviction
    is dropped (``numRowsDroppedByWatermark``), while one landing in the
    same batch as the eviction still merges — both within the documented
    "late data may be dropped" semantics (pinned in
    tests/test_streaming_sessions.py). State is bounded by watermark
    horizon x vocabulary-per-window.
    """
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf

    tok = tokenize_udf(stem)
    return (
        docs.withWatermark(ts_col, watermark)
        .select(ts_col, F.explode(tok(F.col(text_col))).alias("term"))
        .groupBy(F.window(ts_col, window).alias("win"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "term",
            "n",
        )
    )


_DEDUP_OUT_SCHEMA = "text_hash STRING, kept_doc_id BIGINT"
_DEDUP_STATE_SCHEMA = "kept_doc_id BIGINT"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (text_hash,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        # hash already canonicalized in an earlier batch: drop silently
        return
    winner = int(rows["doc_id"].min())
    state.update((winner,))
    yield pd.DataFrame({"text_hash": [text_hash], "kept_doc_id": [winner]})


def streaming_dedup_first(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Continuous exact dedup of a document stream: emit exactly ONE
    canonical ``(text_hash, kept_doc_id)`` row per distinct md5(text)
    across the whole stream — the first-arrival batch wins, min doc_id
    within a batch. Under the ingest contract the incremental indexer
    already enforces (doc_ids assigned monotonically per batch), the
    winner equals the batch-world ``min(doc_id) per hash``, which is what
    makes the driver's SQL oracle possible.

    State is one long per distinct hash (the canonical id), sharded by
    key hash across the state store — the streaming twin of
    :func:`~fulltextsearch_spark.operators.dedup.exact_dedup`. Later
    duplicates update nothing and emit nothing, so downstream sees an
    append-only stream of canonical docs.
    """
    hashed = docs.select(
        F.md5(F.col(text_col)).alias("text_hash"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
