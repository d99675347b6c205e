"""Streaming twins of the batch operators.

State discipline at scale: every stateful op carries a watermark so state
is evicted — unbounded dropDuplicates state is the classic 100 TB streaming
failure mode. Output modes chosen so sinks see only finalized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame, key_cols: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Exact dedup on a stream: the watermark bounds the dedup state
    window — duplicates farther apart than the watermark are out of
    contract (they are caught by the batch dedup_exact pass in the
    lakehouse).

    ``dropDuplicatesWithinWatermark``, NOT ``dropDuplicates``: with plain
    dropDuplicates the watermark only evicts state when the event-time
    column is part of the key, so keyed dedup state would grow without
    bound — the exact failure mode this module exists to prevent.

    Streaming twin of operators/dedup.dedup_exact."""
    deduped = events.withWatermark(ts_col, watermark)
    if events.isStreaming:
        return deduped.dropDuplicatesWithinWatermark(key_cols)
    # batch twin for parity tests: no state to bound
    return deduped.dropDuplicates(key_cols)


def sessionize_stateful(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom stateful sessionizer via ``applyInPandasWithState`` — the
    streaming twin of operators/events.events_sessionize (gap-based, same
    per-user outputs), for when ``session_window`` can't express the logic
    (here: running max session duration across the user's whole history).

    State per user_id is O(1) — six longs (closed-session aggregates + the
    open session) — NOT the event buffer; at 10^9 users the state store
    stays bounded and each micro-batch is a single shuffle on user_id.
    Events must arrive per-user in ts order across micro-batches (upstream
    watermark/sort contract); within a batch we sort in-kernel.

    Input: DataFrame[user_id long, t long (epoch seconds)], streaming.
    Output (update mode): user_id, n_sessions, n_events, max_session_s.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, n_sessions long, n_events long, max_session_s long"
    )
    state_schema = (
        "n_sessions long, n_events long, max_closed long, "
        "cur_start long, cur_last long"
    )

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(x) for x in pdf["t"])
        ts.sort()
        if state.exists:
            n_sessions, n_events, max_closed, cur_start, cur_last = state.get
        else:
            n_sessions, n_events, max_closed, cur_start, cur_last = 0, 0, 0, -1, -1
        for t in ts:
            n_events += 1
            if cur_start < 0:
                n_sessions += 1
                cur_start = cur_last = t
            elif t - cur_last > gap_s:
                max_closed = max(max_closed, cur_last - cur_start)
                n_sessions += 1
                cur_start = cur_last = t
            else:
                cur_last = t
        state.update((n_sessions, n_events, max_closed, cur_start, cur_last))
        cur_dur = (cur_last - cur_start) if cur_start >= 0 else 0
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_sessions": n_sessions,
                    "n_events": n_events,
                    "max_session_s": max(max_closed, cur_dur),
                }
            ]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def hourly_rollup_stream(
    events: DataFrame, ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Windowed rollup with late-data handling: the streaming twin of
    operators/events.events_hourly (same grouping keys and aggregates —
    except ``n_users``, where exact countDistinct is unsupported in
    streaming aggregations, so the twin reports
    ``approx_count_distinct`` (HLL, default 5% relative error) under the
    same column name; consumers moving between modes keep the column but
    must treat it as approximate in streaming)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).alias("sum_value_d"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            F.col("sum_value_d").cast("double").alias("sum_value"),
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# Streaming incremental bloom dedup — the continuous-ingestion twin of
# operators/dedup.dedup_incremental_bloom: every micro-batch is screened
# against the gram Bloom of EVERYTHING ingested before it, then its own
# grams fold into the filter (bit-OR). State is one m-bit file — never the
# corpus — so a year of crawl dedups each day's batch in O(batch), and the
# filter survives restarts on disk next to the stream checkpoint.

BLOOM_STREAM_M = 1 << 20  # fixed filter size: bloom_or needs equal sizes
BLOOM_STREAM_N = 5        # gram window (tokens), matches the batch twin




_BLOOM_STATE_HDR = "<qi"  # (last_batch int64, m_bits int32) + filter bytes


def load_bloom_state(state_dir: str):
    """(last_batch, m_bits, bloom_bytes|None) from the single atomic state
    file; (-1, 0, None) when no batch has committed yet."""
    import os
    import struct

    p = os.path.join(state_dir, "bloom_state.bin")
    if not os.path.exists(p):
        return -1, 0, None
    raw = open(p, "rb").read()
    hdr = struct.calcsize(_BLOOM_STATE_HDR)
    last, m = struct.unpack(_BLOOM_STATE_HDR, raw[:hdr])
    blob = raw[hdr:]
    return last, m, (blob if blob else None)


def _commit_bloom_state(state_dir: str, batch_id: int, m_bits: int, bloom) -> None:
    import os
    import struct

    p = os.path.join(state_dir, "bloom_state.bin")
    tmp = p + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(struct.pack(_BLOOM_STATE_HDR, batch_id, m_bits))
        if bloom is not None:
            fh.write(bloom)
    os.replace(tmp, p)




def bloom_screen_and_fold(
    bdf: DataFrame,
    state_dir: str,
    out_dir: str,
    batch_id: int,
    m_bits: int = BLOOM_STREAM_M,
    n_gram: int = BLOOM_STREAM_N,
) -> None:
    """foreachBatch body: screen ``bdf`` (documents schema) against the
    persisted corpus bloom, write per-doc seen-fractions under
    ``out_dir/batch_id=<id>``, then fold the batch's grams into the filter.

    Exactly-once, with no ordering window: the batch marker and the filter
    live in ONE state file replaced atomically (os.replace), and the
    output goes to a batch-keyed subdir in overwrite mode — so a replay
    after a crash at ANY point either short-circuits (state committed) or
    re-screens against the identical OLD state and overwrites the same
    subdir (state not committed). Splitting marker and bloom into two
    files would reopen the window where a replay screens a batch against
    its own folded grams. Single-writer contract: one stream owns a
    state_dir (same as the ingest estimate's per-table rule).

    Scale: the filter (128 KB default) ships to executors inside the
    Arrow-batched probe UDF's closure; grams never shuffle for the screen
    (pure map), and the fold reduces each partition to ONE m-bit blob
    before the driver ORs them."""
    import os

    from pyspark.sql.functions import pandas_udf

    from nessie_spark.lakehouse.bloom import _bit_positions, bloom_from_keys, bloom_or
    from nessie_spark.operators.dedup import _word_grams

    os.makedirs(state_dir, exist_ok=True)
    last, _m, bloom = load_bloom_state(state_dir)
    if batch_id <= last:  # replayed micro-batch: fully committed already
        return

    dg = _word_grams(bdf, n_gram).select("doc_id", "g").distinct()

    @pandas_udf("boolean")
    def _seen(grams):
        import numpy as np
        import pandas as pd

        if bloom is None:
            return pd.Series([False] * len(grams))
        bits = np.frombuffer(bloom, dtype=np.uint8)
        m = len(bloom) * 8
        out = []
        for g in grams:
            out.append(
                all(bits[p >> 3] & (1 << (p & 7)) for p in _bit_positions(g, m))
            )
        return pd.Series(out)

    per = (
        dg.withColumn("hit", _seen(F.col("g")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("np"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("nh"),
        )
    )
    screened = (
        bdf.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("np", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("nh", F.lit(0)).cast("long").alias("n_seen"),
            (
                (F.coalesce("nh", F.lit(0)) * 2 >= F.coalesce("np", F.lit(0)))
                & (F.coalesce("np", F.lit(0)) > 0)
            ).alias("flagged"),
        )
    )
    # batch-keyed subdir + overwrite = idempotent on replay (partition
    # discovery surfaces batch_id as a column for readers of out_dir)
    screened.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch_id={batch_id}")
    )

    def _partial(batches):
        import pandas as pd

        keys = []
        for pdf in batches:
            keys.extend(pdf["g"].tolist())
        blob = bloom_from_keys(keys, m=m_bits)
        yield pd.DataFrame({"b": [blob if blob is not None else b""]})

    partials = [
        r.b
        for r in dg.select("g").distinct().mapInPandas(_partial, "b binary").collect()
        if r.b
    ]
    new_bloom = bloom
    for p in partials:
        new_bloom = bloom_or(new_bloom, p)
    _commit_bloom_state(state_dir, batch_id, m_bits, new_bloom)


def start_bloom_dedup(
    stream_df: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the streaming incremental bloom dedup over a documents
    stream. ``available_now=True`` drains what exists and stops (test /
    backfill mode)."""
    writer = (
        stream_df.writeStream.foreachBatch(
            lambda b, bid: bloom_screen_and_fold(b, state_dir, out_dir, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_CMS_STATE_HDR = "<qii"  # last_batch, d, w (counters + candidates follow)


def load_cms_state(state_dir: str):
    """(last_batch, counters|None, candidates) from the single atomic CMS
    state file; (-1, None, []) before the first commit. ``counters`` is a
    d×w int64 numpy matrix; ``candidates`` is the tracked token list."""
    import json
    import os
    import struct

    import numpy as np

    p = os.path.join(state_dir, "cms_state.bin")
    if not os.path.exists(p):
        return -1, None, []
    raw = open(p, "rb").read()
    hdr = struct.calcsize(_CMS_STATE_HDR)
    last, d, w = struct.unpack(_CMS_STATE_HDR, raw[:hdr])
    body = raw[hdr:]
    counters = np.frombuffer(body[: d * w * 8], dtype=np.int64).reshape(d, w).copy()
    cands = json.loads(body[d * w * 8 :].decode("utf-8"))
    return last, counters, cands


def _commit_cms_state(state_dir: str, batch_id: int, counters, cands: list) -> None:
    import json
    import os
    import struct

    p = os.path.join(state_dir, "cms_state.bin")
    tmp = p + ".tmp"
    d, w = counters.shape
    with open(tmp, "wb") as fh:
        fh.write(struct.pack(_CMS_STATE_HDR, batch_id, d, w))
        fh.write(counters.tobytes())
        fh.write(json.dumps(cands, ensure_ascii=False).encode("utf-8"))
    os.replace(tmp, p)


CMS_STREAM_CAND = 256  # tracked candidate tokens (Misra-Gries-style heap)


def cms_fold_and_rank(
    bdf: DataFrame,
    state_dir: str,
    out_dir: str,
    batch_id: int,
    k: int = 20,
    cand_cap: int = CMS_STREAM_CAND,
) -> None:
    """foreachBatch body: fold the micro-batch's token counts into the
    persisted count-min sketch and write the running top-``k`` heavy
    hitters under ``out_dir/batch_id=<id>`` — the continuous twin of
    operators/textstats.heavy_hitters_cms (same d×w geometry, same
    seeded-h64 hash family, so the folded counters equal the batch
    sketch's EXACTLY: CMS addition is linear).

    State discipline mirrors bloom_screen_and_fold: marker + counters +
    candidate list live in ONE atomically-replaced file, the output subdir
    is batch-keyed overwrite — a crash-replay either short-circuits or
    redoes identical work. Counter traffic per batch is the ≤ d·w
    aggregated (row, bucket) cells (bounded regardless of batch size, one
    map-side-combining groupBy); candidates are the tracked set ∪ the
    batch's top-``cand_cap`` tokens, estimated driver-side from the folded
    matrix (≤ 2·cand_cap scalars). Approximation contract (the standard
    sketch+heap one): a token never inside any batch's top-``cand_cap``
    can be missed even if its lifetime sum qualifies; est counts
    themselves are exact-CMS (overestimate-only) whenever reported."""
    import os

    import numpy as np

    from nessie_spark.functions.core import h64_seeded
    from nessie_spark.operators.textstats import CMS_D, CMS_W

    os.makedirs(state_dir, exist_ok=True)
    last, counters, cands = load_cms_state(state_dir)
    if batch_id <= last:  # replayed micro-batch: fully committed already
        return
    if counters is None:
        counters = np.zeros((CMS_D, CMS_W), dtype=np.int64)

    toks = bdf.select(
        F.explode(F.split(F.trim("text"), r"[ \t\n\f\r]+")).alias("tok")
    )
    rb = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(h64_seeded(F.col("tok"), f"cms{r}"), F.lit(CMS_W)).alias(
                    "bucket"
                ),
            )
            for r in range(CMS_D)
        ]
    )
    cells = (
        toks.select(F.explode(rb).alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    for row in cells:
        counters[row.r, row.bucket] += row.cnt
    batch_top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(cand_cap)
        .collect()
    )
    tracked = sorted(set(cands) | {r.tok for r in batch_top})

    def est(tok: str) -> int:
        import hashlib

        vals = []
        for r in range(CMS_D):
            h = int(hashlib.md5(f"cms{r}|{tok}".encode()).hexdigest()[:15], 16)
            vals.append(int(counters[r, h % CMS_W]))
        return min(vals)

    scored = sorted(((t, est(t)) for t in tracked), key=lambda kv: (-kv[1], kv[0]))
    new_cands = [t for t, _ in scored[:cand_cap]]
    import pandas as pd

    top = pd.DataFrame(scored[:k], columns=["tok", "est_count"])
    top["rank"] = range(len(top))
    sdf = bdf.sparkSession.createDataFrame(
        top[["rank", "tok", "est_count"]],
        "rank int, tok string, est_count long",
    )
    sdf.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch_id={batch_id}")
    )
    _commit_cms_state(state_dir, batch_id, counters, new_cands)


def start_cms_heavy_hitters(
    stream_df: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the streaming heavy-hitter tracker over a documents stream
    (same drain semantics as start_bloom_dedup)."""
    writer = (
        stream_df.writeStream.foreachBatch(
            lambda b, bid: cms_fold_and_rank(b, state_dir, out_dir, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def join_streams_attributed(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    max_delay_s: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream event-time interval join — the attribution shape
    (view → purchase within ``max_delay_s``), completing §2.8's stateful
    roster (dedup / rollup / sessionize / upsert / bloom / and now
    two-stream joins).

    Both sides carry a watermark and the join predicate bounds the
    event-time distance (``r.ts BETWEEN l.ts AND l.ts + max_delay``), so
    Structured Streaming can evict BOTH state stores: a buffered left row
    dies once the right watermark passes ``l.ts + max_delay``, a right row
    once the left watermark passes ``r.ts``. Without the time bound the
    left buffer is immortal — the stream-stream analog of the unbounded
    dropDuplicates failure mode this module documents.

    Scale: one shuffle per side on ``key``; per-key state is
    O(arrival rate × (watermark + max_delay)) independent of stream
    length. Inner join → append mode, rows finalize exactly once.

    Works identically on batch frames (watermarks are no-ops there) — the
    parity contract tests rely on that."""
    l = left.select(
        F.col(key),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("_rk"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    ).withWatermark("r_ts", watermark)
    cond = (
        (l[key] == r["_rk"])
        & (r["r_ts"] >= l["l_ts"])
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {max_delay_s} SECONDS"))
    )
    return l.join(r, cond, "inner").select(
        key,
        "l_event_id",
        "r_event_id",
        F.unix_timestamp("l_ts").alias("l_epoch"),
        (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias("delay_s"),
    )
