"""Structured Streaming surface (net-new; the reference has no streaming —
SURVEY §2.8). Adds the streaming analytics a large-scale pipeline needs over
an `events(event_id, ts, user_id, event_type, value, props)` stream:

- windowed_event_aggregates: tumbling-window counts/sums per event_type with
  a watermark for late data;
- streaming_group_stats: incremental per-group sufficient statistics (the
  same Gram-vector pattern as the batch engine) so a downstream job can
  solve decomposition betas continuously from a stream;
- sessionize: session windows per user.

All are plain readStream->writeStream plans; tests drive them with
availableNow triggers over the driver-provided events parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "windowed_event_aggregates",
    "streaming_hll_registers",
    "streaming_cms_cells",
    "streaming_histogram_cells",
    "streaming_drift_cells",
    "streaming_constraint_cells",
    "streaming_group_stats",
    "sessionize",
    "streaming_decomposition_stats",
    "streaming_dedup",
    "streaming_corpus_gate",
    "streaming_enrich_last_state",
    "streaming_vocab_cells",
    "streaming_dsir_scores",
    "streaming_source_quota",
    "streaming_ingest_dedup",
    "streaming_mg_candidates",
    "mg_snapshot_candidates",
    "sessionize_batch",
]


def _event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """withWatermark requires TIMESTAMP (LTZ) event time; sources rewritten
    through the pandas ingest path can carry TIMESTAMP_NTZ — cast it here so
    every streaming entry point accepts either."""
    for f in events.schema.fields:
        if f.name == ts_col and f.dataType.typeName() == "timestamp_ntz":
            return events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def windowed_event_aggregates(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window aggregates with late-data watermark."""
    return (
        _event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
            "approx_users",
        )
    )


def streaming_group_stats(
    events: DataFrame,
    group_col: str = "event_type",
    ycol: str = "value",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-group running sufficient statistics (n, sum, sum of squares) —
    enough to solve means/variances/one-predictor models downstream without
    reprocessing the stream."""
    return (
        _event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(ycol).alias("s1"),
            F.sum(F.col(ycol) * F.col(ycol)).alias("s2"),
        )
    )


def streaming_decomposition_stats(
    stream: DataFrame,
    group_col: str,
    ycol: str,
    xcols: list[str],
    timeout_ms: int = 0,
) -> DataFrame:
    """Custom STATEFUL operator (applyInPandasWithState): maintains each
    group's running Gram statistics (X'X upper triangle, X'y, sums, n) across
    micro-batches and emits the updated sufficient statistics + the current
    one-predictor-at-a-time solvable state every batch.

    This is the streaming face of the engine's core design: a downstream
    consumer can solve betas / decompose gaps continuously without ever
    reprocessing history. State per group is O(k^2) floats — bounded forever.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    k = len(xcols)
    tri = [(i, j) for i in range(k) for j in range(i, k)]
    state_len = len(tri) + 2 * k + 3  # xx, xsum, xy, yty, ysum, n

    out_schema = StructType(
        [
            StructField("group", StringType()),
            StructField("n", LongType()),
            StructField("beta", ArrayType(DoubleType())),
            StructField("stats", ArrayType(DoubleType())),
        ]
    )
    state_schema = StructType([StructField("acc", ArrayType(DoubleType()))])

    def update(key, pdfs, state: GroupState):
        acc = np.zeros(state_len)
        if state.exists:
            (prev,) = state.get
            acc += np.asarray(prev, dtype=np.float64)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            X = pdf[list(xcols)].to_numpy(dtype=np.float64)
            y = pdf[ycol].to_numpy(dtype=np.float64)
            c = 0
            for (i, j) in tri:
                acc[c] += float((X[:, i] * X[:, j]).sum())
                c += 1
            acc[c: c + k] += X.sum(axis=0)
            c += k
            acc[c: c + k] += (X * y[:, None]).sum(axis=0)
            c += k
            acc[c] += float((y * y).sum())
            acc[c + 1] += float(y.sum())
            acc[c + 2] += float(len(pdf))
        state.update((acc.tolist(),))
        n = int(acc[-1])
        beta = []
        if n > k:
            xtx = np.zeros((k, k))
            for idx, (i, j) in enumerate(tri):
                xtx[i, j] = xtx[j, i] = acc[idx]
            xty = acc[len(tri) + k: len(tri) + 2 * k]
            try:
                beta = [float(b) for b in np.linalg.solve(xtx + 1e-12 * np.eye(k), xty)]
            except np.linalg.LinAlgError:
                beta = []
        yield pd.DataFrame(
            {"group": [key[0]], "n": [n], "beta": [beta], "stats": [acc.tolist()]}
        )

    return (
        stream.groupBy(group_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_enrich_last_state(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    kind_col: str = "kind",
    value_col: str = "value",
    state_kind: str = "state",
) -> DataFrame:
    """Streaming point-in-time enrichment — the streaming face of
    ``operators.asof.asof_join`` (backward direction).

    One tagged stream carries both sides: rows with ``kind_col ==
    state_kind`` update a per-key latest-state register; every OTHER row is
    an event, emitted as (key, ts, asof_value, asof_ts) holding the most
    recent state at-or-before its timestamp. State per key is one
    (timestamp, value) pair — O(1) forever, no watermark needed.

    Ordering contract: exact within a micro-batch (rows are sorted by
    (ts, state-first)); across batches the register only moves forward, so
    an event arriving in a later batch than a newer state row is enriched
    with that newer state — the standard last-value-register semantics of
    stream enrichment. Use the batch asof_join for exact reprocessing.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import DoubleType, StructField, StructType, TimestampType

    out_schema = StructType(
        [
            StructField(key_col, stream.schema[key_col].dataType),
            StructField(ts_col, TimestampType()),
            StructField("asof_value", DoubleType()),
            StructField("asof_ts", TimestampType()),
        ]
    )
    state_schema = StructType(
        [StructField("sts", DoubleType()), StructField("sv", DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        last_ts, last_v = (state.get if state.exists else (None, None))
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames, ignore_index=True)
            is_state = pdf[kind_col] == state_kind
            pdf = pdf.assign(__kr=(~is_state).astype(int)).sort_values(
                [ts_col, "__kr"], kind="mergesort"
            )
            is_state = pdf[kind_col] == state_kind
            ev_mask = ~is_state
            # Forward-only register: a late state row OLDER than the stored
            # register must not move it backward (nor override enrichment of
            # events that already have a newer register value), so such rows
            # are ignored entirely.
            if last_ts is not None:
                seed_ts = pd.Timestamp(last_ts, unit="s")
                is_state = is_state & (pdf[ts_col] >= seed_ts)
            sv = pdf[value_col].where(is_state).ffill()
            st = pdf[ts_col].where(is_state).ffill()
            if last_ts is not None:
                sv = sv.fillna(last_v)
                st = st.fillna(seed_ts)
            out = pd.DataFrame(
                {
                    key_col: pdf.loc[ev_mask, key_col],
                    ts_col: pdf.loc[ev_mask, ts_col],
                    "asof_value": sv[ev_mask],
                    "asof_ts": st[ev_mask],
                }
            )
            new_last = st[is_state].iloc[-1] if is_state.any() else None
            if new_last is not None and not pd.isna(new_last):
                state.update(
                    (float(st[is_state].iloc[-1].timestamp()),
                     float(sv[is_state].iloc[-1]))
                )
            yield out
        else:
            yield pd.DataFrame(
                {key_col: [], ts_col: [], "asof_value": [], "asof_ts": []}
            )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact deduplication — the streaming face of
    `operators.dedup.exact_duplicates` for an ingest pipeline.

    `dropDuplicatesWithinWatermark` keeps per-key state only until the
    watermark passes (bounded state forever, unlike a plain dropDuplicates
    whose state grows without limit on an unbounded stream). Keys default to
    the event id; pass e.g. a content hash column for payload-level dedup.
    """
    keys = list(keys) if keys else ["event_id"]
    return _event_time(events, ts_col).withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user (gap-based)."""
    return (
        _event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def streaming_corpus_gate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    watermark: str = "2 hours",
    scrub_pii: bool = False,
    blocklist_terms: list[str] | None = None,
) -> DataFrame:
    """Streaming ingest gate for a document corpus — the streaming face of
    ``operators.corpus.prepare_corpus`` stages 1-2.

    Stateless quality + language scoring (pure codegen, textops) filters
    each micro-batch; exact dedup on the canonical 5-token-prefix
    fingerprint uses ``dropDuplicatesWithinWatermark`` so per-fingerprint
    state is dropped once the watermark passes. Near-dup clustering is NOT
    streamed — connected components need global graph state; the standard
    architecture is this gate on ingest plus a periodic batch
    ``prepare_corpus`` compaction over the accumulated table.

    ``scrub_pii=True`` adds a redacted ``text`` column
    (``textops.pii_scrub`` — stateless regexp chain, so it streams with no
    extra state), letting the gate emit train-safe text directly.

    ``blocklist_terms`` applies the C4 bad-words rule BEFORE the quality
    gate, mirroring the batch composition (prepare_corpus): the literal-
    array codegen predicate from textops.blocklist_filter is stateless, so
    it streams for free. Streaming keeps the literal regime only — a
    beyond-literal-size list needs the broadcast-join face, which belongs
    in the periodic batch compaction, not the ingest gate.

    Output: (doc_id, ts, fingerprint, n_tokens, quality, lang [, text])
    survivors.
    """
    from ..operators import textops

    if blocklist_terms:
        if len({b.lower() for b in blocklist_terms}) > 512:
            raise ValueError(
                "streaming gate supports literal blocklists only (<= 512 "
                "case-folded terms); run bigger lists in the batch compaction"
            )
        docs = textops.blocklist_filter(
            docs, blocklist_terms, text_col=text_col, id_col=id_col
        )

    t = F.col(text_col)
    toks = F.split(F.trim(F.lower(t)), r"\s+")
    cols = [
        F.col(id_col),
        F.col(ts_col),
        t.alias("__text"),
        F.md5(F.concat_ws(" ", F.slice(toks, 1, 5))).alias("fingerprint"),
        textops.token_count(t).alias("n_tokens"),
        F.round(textops.quality_score(t), 6).alias("quality"),
        textops.lang_id(t).alias("lang"),
    ]
    if scrub_pii:
        cols.append(textops.pii_scrub(t).alias("text"))
    scored = docs.select(*cols)
    kept = scored.filter(
        (F.col("quality") >= float(min_quality)) & F.col("lang").isin(list(langs))
    ).drop("__text")
    return (
        _event_time(kept, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def sessionize_batch(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    ts_fmt: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Batch analogue of ``sessionize`` — identical session semantics
    (session end = last event + gap, a new session when the inter-event gap
    is >= the gap duration) on a static frame, with string-formatted window
    bounds so results are engine-portable. One shuffle keyed on user_id."""
    return (
        _event_time(events, ts_col)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("session_value"))
        .select(
            F.date_format("w.start", ts_fmt).alias("session_start"),
            F.date_format("w.end", ts_fmt).alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def streaming_hll_registers(
    events: DataFrame,
    col: str = "user_id",
    p: int = 8,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming HyperLogLog: per tumbling window, the (register, rho)
    sketch state for distinct ``col`` values — the continuous distinct-user
    counter. State per (window, register) is ONE small int (the max rho),
    bounded at 2^p rows per window regardless of stream volume, and the
    watermark expires closed windows, so state never grows unboundedly —
    the exact property that makes HLL the streaming cardinality primitive.

    Emitted registers are mergeable downstream exactly like the batch
    table (operators/sketches.py): groupBy(register).max(rho) across
    windows or streams IS the sketch union, and the batch estimator
    (hll_alpha formula) turns any merged register set into a count.
    The register/rho math is byte-identical to the batch operator, which
    the driver hash-checks cross-engine (hll_registers row)."""
    from ..operators.sketches import _rho_expr

    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    h = F.xxhash64(F.col(col).cast("string"))
    return (
        _event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window_duration).alias("w"),
            F.shiftrightunsigned(h, 64 - p).alias("register"),
        )
        .agg(F.max(_rho_expr(h, p)).alias("rho"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "register",
            "rho",
        )
    )


def streaming_cms_cells(
    events: DataFrame,
    col: str = "user_id",
    w: int = 1024,
    d: int = 4,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming count-min sketch: per tumbling window, the (row, col, cnt)
    cell table for ``col``'s value frequencies — the continuous
    heavy-hitter tracker. State is bounded at d*w cells per window and the
    watermark expires closed windows. Cells merge downstream by per-cell
    SUM (across windows or streams), exactly like the batch table
    (operators/sketches.cms_table), whose hash math this shares and which
    the driver hash-checks cross-engine (cms_user_counts row)."""
    from ..operators.sketches import _cms_cells_expr

    cells = _cms_cells_expr(col, w, d)
    return (
        _event_time(events, ts_col).withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode(cells).alias("__c"))
        .groupBy(
            F.window(ts_col, window_duration).alias("wnd"),
            F.col("__c.row").alias("row"),
            F.col("__c.col").alias("col"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("wnd.start").alias("window_start"),
            F.col("wnd.end").alias("window_end"),
            "row",
            "col",
            "cnt",
        )
    )


def streaming_histogram_cells(
    events: DataFrame,
    col: str = "value",
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 64,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming equi-width histogram: per tumbling window, the (bin, n)
    count table for ``col`` over FIXED bounds [lo, hi] — the continuous
    distribution tracker that feeds histogram-based quantile estimates
    (operators/profiling.histogram_quantiles) without ever sorting.
    Bounds must be fixed a priori in a stream (no global min/max exists
    yet); values outside [lo, hi] are dropped, values exactly at ``hi``
    fall in the last bin — the same closed-right-edge convention as the
    batch histogram, whose bin expression this mirrors. State is bounded
    at ``bins`` rows per open window and the watermark expires closed
    windows; cells merge downstream by per-bin SUM across windows,
    shards or streams."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / bins
    c = F.col(col).cast("double")
    bin_expr = F.least(
        F.floor((c - F.lit(lo)) / F.lit(width)).cast("long"), F.lit(bins - 1)
    )
    return (
        _event_time(events, ts_col).withWatermark(ts_col, watermark)
        .filter(c.isNotNull() & (c >= lo) & (c <= hi))
        .select(F.col(ts_col), bin_expr.alias("bin"))
        .groupBy(F.window(ts_col, window_duration).alias("wnd"), "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("wnd.start").alias("window_start"),
            F.col("wnd.end").alias("window_end"),
            "bin",
            "n",
        )
    )


def streaming_drift_cells(
    events: DataFrame,
    cat_cols: list[str] | None = None,
    num_cols: list[str] | None = None,
    bins: int = 10,
    bounds: dict[str, tuple[float, float]] | None = None,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming drift monitor feed: per tumbling window, the
    (dim, bucket, n) count table over the SAME bucketing as the batch
    drift operators (operators/profiling._drift_long_form — categorical by
    value with "(null)", numeric by equi-width bins over fixed `bounds`).
    Numeric dims REQUIRE explicit bounds: a stream has no global min/max
    yet, the same reason streaming_histogram_cells takes fixed [lo, hi].

    Downstream, each window's cells (or any SUM-merge of windows) feed
    profiling.psi_from_counts against a reference snapshot's
    drift_bucket_counts — continuous PSI against the training
    distribution without rescanning the reference. State is bounded at
    dims x buckets rows per open window; the watermark expires closed
    windows.
    """
    from ..operators.profiling import _drift_edges, _drift_long_form

    cat_cols = cat_cols or []
    num_cols = num_cols or []
    if not cat_cols and not num_cols:
        raise ValueError("need at least one of cat_cols / num_cols")
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if num_cols and not (bounds and all(c in bounds for c in num_cols)):
        raise ValueError("streaming numeric dims require explicit bounds")
    edges = _drift_edges(num_cols, bounds, [])
    long = _drift_long_form(
        _event_time(events, ts_col).withWatermark(ts_col, watermark),
        cat_cols,
        num_cols,
        bins,
        edges,
        extra_cols=(ts_col,),
    )
    return (
        long.groupBy(F.window(ts_col, window_duration).alias("wnd"), "dim", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("wnd.start").alias("window_start"),
            F.col("wnd.end").alias("window_end"),
            "dim",
            "bucket",
            "n",
        )
    )


def streaming_vocab_cells(
    docs: DataFrame,
    text_col: str = "text",
    by: str = "source",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming vocabulary monitor feed: per tumbling window, the
    (group, token, n) count cells over the SAME lowercased whitespace
    tokenization as the batch textops.vocab_stats. Cells from any set of
    windows SUM-merge into exactly the batch (by, token) count table, so
    type counts / TTR / hapax fraction / top token are computable over
    any horizon without rescanning the stream — the same
    mergeable-cells contract as the histogram/CMS/drift faces. State is
    bounded at (groups x distinct tokens) rows per open window; the
    watermark expires closed windows.
    """
    toks = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("__tok")
    long = (
        _event_time(docs, ts_col)
        .withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.col(by), toks)
        .filter(F.col("__tok") != "")
    )
    return (
        long.groupBy(F.window(ts_col, window_duration).alias("wnd"), by, "__tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("wnd.start").alias("window_start"),
            F.col("wnd.end").alias("window_end"),
            F.col(by),
            F.col("__tok").alias("token"),
            "n",
        )
    )


def streaming_constraint_cells(
    events: DataFrame,
    rules: list[dict],
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming face of quality.check_constraints for the ROW-LEVEL rules
    (not_null / range / in_set / predicate): per tumbling window, one row
    per rule with exact violation and total counts — the CI gate run
    continuously over an ingest stream. Stateful rules (unique,
    foreign_key) need cross-window memory and are rejected here; run them
    batch-side over the landed table.

    One windowed aggregation evaluates EVERY rule as a conditional count
    column — state per open window is one row of k+1 longs, and cells
    merge downstream by per-rule SUM across windows (violations and n are
    both additive), so a day-level report is a k-key rollup of the hourly
    cells.
    """
    from ..operators.quality import _ROW_RULES, _rule_detail, _violation_expr

    if not rules:
        raise ValueError("rules must be non-empty")
    bad = [r["type"] for r in rules if r["type"] not in _ROW_RULES]
    if bad:
        raise ValueError(
            f"stateful rules not streamable: {bad}; run unique/foreign_key batch-side"
        )
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, r in enumerate(rules):
        aggs.append(
            F.sum(_violation_expr(r).cast("long")).cast("long").alias(f"__v{i}")
        )
    wide = (
        _event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("wnd"))
        .agg(*aggs)
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(r["type"]).alias("constraint"),
                F.lit(_rule_detail(r)).alias("detail"),
                F.col(f"__v{i}").alias("violations"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return wide.select(
        F.col("wnd.start").alias("window_start"),
        F.col("wnd.end").alias("window_end"),
        F.explode(entries).alias("__e"),
        F.col("__n"),
    ).select(
        "window_start",
        "window_end",
        F.col("__e.constraint").alias("constraint"),
        F.col("__e.detail").alias("detail"),
        F.col("__e.violations").alias("violations"),
        F.col("__n").alias("n"),
        (F.col("__e.violations") == 0).alias("ok"),
    )


def streaming_dsir_scores(
    docs: DataFrame,
    ratio: dict[int, int],
    n_buckets: int,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    min_score_micro: int | None = None,
) -> DataFrame:
    """Streaming face of ``operators.corpus.dsir_importance``: online data
    selection with a FROZEN importance table.

    The DSIR ratio table is trained batch-side (``dsir_ratio_table``
    against the trusted target corpus), collected once (B integer rows),
    and folded into a stateless map-only score expression
    (``dsir_score_expr``) — so the stream pays no explode, no shuffle and
    holds NO state: each arriving document's score is one codegen fold
    over its token array, bit-identical to the batch operator's joined
    integer sum. ``min_score_micro`` filters to target-like documents at
    ingest — the standard online shape: retrain the table periodically in
    batch, redeploy the literal.

    Output: (id_col, ts_col, score_micro [, kept rows only]).
    """
    from ..operators.corpus import dsir_score_expr

    score = dsir_score_expr(ratio, n_buckets, seed=seed, text_col=text_col)
    out = _event_time(docs, ts_col).select(
        F.col(id_col), F.col(ts_col), score.alias("score_micro")
    )
    if min_score_micro is not None:
        out = out.filter(F.col("score_micro") >= int(min_score_micro))
    return out


def streaming_source_quota(
    stream: DataFrame,
    budget_tokens: int,
    by: str = "source",
    ts_col: str = "ts",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Streaming face of ``operators.corpus.source_token_quota``: online
    per-source token-budget enforcement at ingest.

    State per source is ONE running token total (O(1) forever, no
    watermark needed); each arriving document is emitted with its
    per-source token_offset and keep = offset < budget — the batch
    operator's exclusive-cumsum convention, so every non-empty source
    admits its first document and the boundary document may overshoot.

    Ordering contract: within a micro-batch documents accumulate in
    (ts, id) order; across batches, arrival order IS the accumulation
    order (the online semantics — a quota gate cannot reorder history).
    Replaying the accumulated table through the batch operator gives the
    id-ordered offsets instead; the two agree whenever arrival order is
    id order (pinned by the parity e2e).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    budget = int(budget_tokens)
    out_schema = StructType(
        [
            StructField(id_col, stream.schema[id_col].dataType),
            StructField(by, stream.schema[by].dataType),
            StructField(ts_col, TimestampType()),
            StructField(token_col, LongType()),
            StructField("token_offset", LongType()),
            StructField("keep", BooleanType()),
        ]
    )
    state_schema = StructType([StructField("total", LongType())])

    def update(key, pdfs, state: GroupState):
        total = int(state.get[0]) if state.exists else 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            # Unreachable with NoTimeout (every invocation carries rows), but
            # if a timeout is ever enabled the empty frame must carry dtypes
            # matching out_schema — empty object-dtype columns fail the
            # Arrow conversion to timestamp/long at runtime (r9 ADVICE).
            yield pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    by: pd.Series([], dtype="object"),
                    ts_col: pd.Series([], dtype="datetime64[us]"),
                    token_col: pd.Series([], dtype="int64"),
                    "token_offset": pd.Series([], dtype="int64"),
                    "keep": pd.Series([], dtype="bool"),
                }
            )
            return
        pdf = pd.concat(frames, ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        ntok = pdf[token_col].astype("int64")
        csum = ntok.cumsum() - ntok + total  # exclusive running total
        out = pd.DataFrame(
            {
                id_col: pdf[id_col],
                by: key[0] if isinstance(key, tuple) else key,
                ts_col: pdf[ts_col],
                token_col: ntok,
                "token_offset": csum.astype("int64"),
                "keep": (csum < budget),
            }
        )
        state.update((total + int(ntok.sum()),))
        yield out

    return (
        _event_time(stream, ts_col)
        .groupBy(by)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_ingest_dedup(
    spark,
    source_dir: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
    sig_threshold: float = 0.9,
    timeout_sec: int = 300,
) -> None:
    """Streaming incremental-ingest dedup — the `foreachBatch` face of
    ``operators.dedup.incremental_dedup``, and the one streaming surface
    here whose cross-batch state lives in an EXTERNAL store (parquet)
    rather than Spark's operator state. Each micro-batch of new documents

      1. exact-dedups WITHIN itself (keep-min-id per md5 fingerprint —
         two copies arriving in the same batch resolve immediately),
      2. drops documents duplicating the persisted state
         (``incremental_dedup``: fingerprint equi-join exact + derived-
         band collision with signature-agreement near — corpus text never
         read),
      3. writes the survivors under ``out_dir`` and APPENDS their state
         rows under ``state_dir`` — so a duplicate arriving in a LATER
         micro-batch of a document kept in an EARLIER one is caught
         through the state that earlier batch just wrote.

    Built-in stateful operators cannot express this (the dedup "state"
    here is content-addressed MinHash/fingerprint rows that must outlive
    the query and be shared with batch ingests), so ``foreachBatch`` is
    the honest mechanism: the sink function runs arbitrary BATCH
    DataFrame code per micro-batch with exactly-once bookkeeping of which
    input files were consumed.

    Idempotency contract: foreachBatch re-runs a micro-batch after a
    failure, so both writes go to per-batch subdirectories
    (``batch_<id>/``) in OVERWRITE mode — a replayed batch rewrites its
    own output instead of double-appending. Bootstrap the state by
    writing ``dedup_state(corpus)`` under ``state_dir`` (any subdir, e.g.
    ``base/``) before the first run; the state is read with
    recursiveFileLookup so base + per-batch appends form one table.

    One source file per micro-batch (``maxFilesPerTrigger`` 1, the
    one-file-one-batch replay convention); runs the availableNow replay
    to completion (resuming ``checkpoint_dir`` if it exists) and returns
    after ``timeout_sec`` at the latest.

    Scale shape (100 TB): per-batch text work is batch-sized; the state
    contributes hash-row joins only (the ``incremental_dedup`` contract);
    the per-batch state subdirs are append-only parquet a nightly
    compaction can fold into ``base/``.
    """
    from pyspark.sql import Window

    from ..operators.dedup import dedup_state, incremental_dedup

    schema = spark.read.parquet(source_dir).schema

    def _ingest(batch_df, batch_id):
        sess = batch_df.sparkSession
        state = sess.read.option("recursiveFileLookup", "true").parquet(state_dir)
        w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
        b = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        matches = incremental_dedup(
            b, state, text_col=text_col, id_col=id_col,
            num_perm=num_perm, bands=bands, k=k, sig_threshold=sig_threshold,
        )
        kept = b.join(matches.select(id_col), id_col, "left_anti").localCheckpoint(eager=True)
        kept.write.mode("overwrite").parquet(f"{out_dir}/batch_{batch_id}")
        dedup_state(
            kept, text_col=text_col, id_col=id_col, num_perm=num_perm, k=k
        ).write.mode("overwrite").parquet(f"{state_dir}/batch_{batch_id}")

    q = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
        .writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise RuntimeError("streaming_ingest_dedup: availableNow replay timed out")


def streaming_mg_candidates(
    stream: DataFrame,
    col: str,
    capacity: int = 1024,
    n_buckets: int = 32,
    output_mode: str = "update",
) -> DataFrame:
    """Streaming face of ``operators.sketches.mg_summaries``: continuous
    Misra-Gries heavy-hitter candidate tracking over an unbounded stream.

    The CMS face (streaming_cms_cells) tracks FREQUENCIES but cannot name
    the keys; this face keeps the candidate KEY SET itself in bounded
    state — what a live "top domains / top tokens right now" panel needs.

    Keys are hash-bucketed (xxhash64 pmod n_buckets) so state parallelizes
    across ``n_buckets`` stateful tasks instead of one global task; each
    bucket owns a disjoint key slice, so per-bucket MG guarantees compose:
    a key absent from its own bucket's summary has true count <= that
    bucket's delta_total (a fortiori <= the summed bound the batch operator
    uses). State per bucket is one JSON blob of <= capacity counters plus
    the running eviction total — O(n_buckets x capacity) forever, no
    watermark needed.

    Each micro-batch emits the bucket's refreshed summary:
    (bucket, key, mg_est) rows plus one (bucket, NULL, delta_total)
    sentinel — the same wire shape as the batch pass-1, so the downstream
    exact-recount face (sketches.heavy_hitters pass 2) consumes either.

    ``output_mode`` must match the query's writeStream mode: "update" for
    live sinks (memory/kafka — consumers keep the latest snapshot per
    bucket), "append" for file sinks (each batch appends its snapshot, and
    checkpoint recovery works there). Append-mode readers wanting the
    CURRENT summary must take the LATEST snapshot per bucket (e.g. tag
    batches and take the max batch id) — MG counters are NOT monotone
    across snapshots (eviction decrements shrink surviving counters), so
    max-mg_est-over-time can overstate the current summary. Max-over-time
    IS safe as a candidate-superset / undercount bound: every snapshot's
    mg_est is a valid undercount of the key's true running count, and the
    union of snapshot keys only widens the candidate set the exact-recount
    pass verifies anyway.
    """
    import json

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    cap = int(capacity)
    if cap < 1:
        raise ValueError("capacity must be >= 1")
    if not 1 <= int(n_buckets) <= 4096:
        raise ValueError("n_buckets must be in [1, 4096]")

    out_schema = StructType(
        [
            StructField("bucket", LongType()),
            StructField("key", StringType()),
            StructField("mg_est", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("blob", StringType()), StructField("delta_total", LongType())]
    )

    def update(key, pdfs, state: GroupState):
        bucket = int(key[0] if isinstance(key, tuple) else key)
        if state.exists:
            blob, delta_total = state.get
            d = dict(json.loads(blob))
            delta_total = int(delta_total)
        else:
            d, delta_total = {}, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            vc = pdf["key"].dropna().value_counts()
            for k2, c in vc.items():
                d[k2] = d.get(k2, 0) + int(c)
            if len(d) > cap:
                drop = len(d) - cap
                vals = np.fromiter(d.values(), dtype=np.int64, count=len(d))
                delta = int(np.partition(vals, drop - 1)[drop - 1])
                delta_total += delta
                d = {k3: v - delta for k3, v in d.items() if v > delta}
        state.update((json.dumps(d, sort_keys=True), delta_total))
        yield pd.DataFrame(
            {
                "bucket": np.full(len(d) + 1, bucket, dtype=np.int64),
                "key": list(d.keys()) + [None],
                "mg_est": np.asarray(list(d.values()) + [delta_total], dtype=np.int64),
            }
        )

    keyed = stream.select(
        F.col(col).cast("string").alias("key"),
        F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(int(n_buckets))).alias("bucket"),
    ).where(F.col("key").isNotNull())  # nulls never count (batch-face convention)
    if output_mode not in ("update", "append"):
        raise ValueError("output_mode must be update|append")
    return keyed.groupBy("bucket").applyInPandasWithState(
        update, out_schema, state_schema, output_mode, GroupStateTimeout.NoTimeout
    )


def mg_snapshot_candidates(snapshots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Reduce accumulated ``streaming_mg_candidates`` emissions to the
    (candidates, u_bound) pair ``sketches.heavy_hitters_verify`` consumes —
    the bridge that makes the streamed sketch feed the batch exact-recount
    pass.

    ``snapshots`` is the sink's accumulated (bucket, key, mg_est) rows —
    ANY number of update/append snapshots, in any order:

    - candidates = the union of all non-null snapshot keys. A union over
      time is a SUPERSET of the final candidate set (keys can only leave a
      summary, never sneak past it), and a superset is always safe for the
      exact-recount pass — extra candidates cost recount work, never
      correctness.
    - u_bound = sum over buckets of the FINAL delta_total, recovered as
      max(mg_est) over each bucket's NULL-key sentinels: delta_total only
      accumulates (monotone nondecreasing across snapshots), so the max IS
      the latest value — unlike the per-key counters, which eviction can
      shrink (see the streaming_mg_candidates docstring).

    Both outputs are tiny (bounded by buckets x capacity keys / one row);
    the reduction is a pair of keyed aggregates, no window, no sort.
    """
    cands = snapshots.where(F.col("key").isNotNull()).select("key").distinct()
    ub = (
        snapshots.where(F.col("key").isNull())
        .groupBy("bucket")
        .agg(F.max("mg_est").alias("__dt"))
        .agg(F.coalesce(F.sum("__dt"), F.lit(0)).cast("long").alias("u_bound"))
    )
    return cands, ub
