"""Event-sequence analytics: ordered funnels and cohort retention.

Net-new OLAP surface (no reference analogue — the reference has no event
tables); the two queries every product-analytics warehouse runs on an
events stream.

Scale notes (100 TB events):
- funnel: one type-filtered per-user min-aggregation per step (the type
  filter pushes down to the scan), chained by user-keyed joins. No window
  over all events, no collect_list of a user's history — state per user per
  step is ONE timestamp. Each step's reached set is persisted before its
  count and unpersisted once its successor materializes, so step i never
  re-executes steps 1..i-1 — k scans of events total, not k(k+1)/2
  (cache-asserted in test_plans).
- cohort_retention: per-user first-activity period (one agg) + distinct
  (user, period) activity (one agg), joined user-keyed, then a tiny
  (cohort, offset) count aggregation. Nothing larger than the distinct
  activity table ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "cohort_retention", "attribution", "path_transitions"]


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: users advance to step i when an event of type
    ``steps[i]`` occurs STRICTLY after their step i-1 time (earliest such
    chain per user). Returns (step_idx, step, n_users), n_users
    monotonically non-increasing.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ts = F.col(ts_col).cast("timestamp")
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("__t"))
    )
    # Each reached set is persist()ed before its count so the next step's
    # join reads the materialized per-user state instead of re-executing
    # the whole prior chain (which made step i cost i scans of events —
    # k(k+1)/2 total). Now: k scans, and each step's cache is dropped as
    # soon as its successor is materialized, so nothing leaks past the
    # call. Exchange reuse alone can't dedupe this (column pruning
    # rewrites the count branch's aggregate, breaking canonical-plan
    # identity) — the explicit persist is the contract.
    reached = reached.persist()
    counts = [reached.count()]
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, ts.alias("__ts"))
            .join(reached, user_col)
            .filter(F.col("__ts") > F.col("__t"))
            .groupBy(user_col)
            .agg(F.min("__ts").alias("__t"))
        ).persist()
        counts.append(nxt.count())
        reached.unpersist()
        reached = nxt
    reached.unpersist()
    spark = events.sparkSession
    rows = [(i, s, int(c)) for i, (s, c) in enumerate(zip(steps, counts))]
    return spark.createDataFrame(rows, "step_idx long, step string, n_users long")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "day",
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity period
    (their cohort), counted once per (cohort, period-offset) they were
    active in. Returns (cohort_date, offset, active_users).

    ``offset`` counts PERIODS of the chosen granularity, not days: 1 means
    "the next day/week/month/year after the cohort period". Both dates are
    date_trunc'd to the period boundary first, so day/week offsets divide
    exactly and month/year offsets are whole months_between multiples.
    """
    if granularity not in ("day", "week", "month", "year"):
        raise ValueError(f"unsupported granularity: {granularity!r}")
    period = F.date_trunc(granularity, F.col(ts_col).cast("timestamp")).cast("date")
    firsts = (
        events.select(user_col, period.alias("__p"))
        .groupBy(user_col)
        .agg(F.min("__p").alias("__cohort"))
    )
    acts = events.select(user_col, period.alias("__p")).distinct()
    day_diff = F.datediff(F.col("__p"), F.col("__cohort"))
    if granularity == "day":
        offset = day_diff
    elif granularity == "week":
        offset = day_diff / F.lit(7)
    elif granularity == "month":
        offset = F.months_between(F.col("__p"), F.col("__cohort"))
    else:  # year
        offset = F.months_between(F.col("__p"), F.col("__cohort")) / F.lit(12)
    return (
        acts.join(firsts, user_col)
        .groupBy(
            F.col("__cohort").alias("cohort_date"),
            offset.cast("long").alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


def attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    model: str = "last_touch",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    lookback_days: int | None = None,
) -> DataFrame:
    """Marketing-style conversion attribution: credit each conversion event
    to the touch channel(s) that preceded it for the same user. Returns
    (channel, credit, credited_value) — credit sums fractional conversion
    credits, credited_value sums credit * conversion value. Conversions
    with no prior touch are credited to the '(direct)' channel.

    Models: 'last_touch' (most recent touch strictly before the
    conversion gets credit 1; deterministic (ts, event_id) tie-break),
    'first_touch' (earliest touch), 'linear' (1/k to each of the k
    touches). ``lookback_days`` bounds how old a touch may be.

    Scale shape (100 TB events): conversions and touches join user-keyed
    (ONE shuffle on user_id); last/first picks are per-conversion
    max/min-of-struct aggregates — no window over the event stream, no
    per-user history collection; linear adds one count aggregate keyed by
    conversion id. The final channel rollup is a k-ary aggregate.
    """
    if model not in ("last_touch", "first_touch", "linear"):
        raise ValueError(f"unknown attribution model: {model!r}")
    ts = F.col(ts_col).cast("timestamp")
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__cid"),
        ts.alias("__ct"),
        F.col(value_col).cast("double").alias("__cv"),
    )
    touch = events.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("__u"),
        ts.alias("__tt"),
        F.col(id_col).alias("__tid"),
        F.col(type_col).alias("channel"),
    )
    j = conv.join(touch, "__u").filter(F.col("__tt") < F.col("__ct"))
    if lookback_days is not None:
        j = j.filter(
            F.col("__tt") >= F.col("__ct") - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
        )
    if model == "linear":
        cnt = j.groupBy("__cid").agg(F.count(F.lit(1)).alias("__k"))
        credits = j.join(cnt, "__cid").select(
            "channel", (F.lit(1.0) / F.col("__k")).alias("credit"), F.col("__cv")
        )
    else:
        pick = F.struct("__tt", "__tid", "channel")
        agg = F.max(pick) if model == "last_touch" else F.min(pick)
        credits = (
            j.groupBy("__cid", "__cv")
            .agg(agg.alias("__pick"))
            .select(
                F.col("__pick.channel").alias("channel"),
                F.lit(1.0).alias("credit"),
                F.col("__cv"),
            )
        )
    direct = (
        conv.join(j.select("__cid").distinct(), "__cid", "left_anti")
        .select(F.lit("(direct)").alias("channel"), F.lit(1.0).alias("credit"), F.col("__cv"))
    )
    return (
        credits.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.round(F.sum("credit"), 4).alias("credit"),
            F.round(F.sum(F.col("credit") * F.col("__cv")), 2).alias("credited_value"),
        )
    )


def path_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    include_endpoints: bool = True,
) -> DataFrame:
    """User-journey transition matrix: count of consecutive event-type
    pairs across every user's time-ordered stream — the edge list behind
    sankey/path analyses. Returns (from_type, to_type, transitions).
    With ``include_endpoints``, each user's first event also yields a
    ('(start)', first_type) edge and their last a (last_type, '(end)')
    edge, so path entry/exit rates read off the same matrix.

    Scale shape: ONE window pass partitioned by user (lag over (ts, id) —
    user cardinality is the partition key, so the sort spreads; no global
    ordering), then a k^2-ary aggregate. Ties at identical timestamps are
    ordered by the unique event id, so the matrix is deterministic.
    """
    from pyspark.sql import Window

    ts = F.col(ts_col).cast("timestamp")
    w = Window.partitionBy(user_col).orderBy(ts, F.col(id_col))
    base = events.select(
        F.col(user_col).alias("__u"),
        ts.alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(type_col).alias("__t"),
    ).withColumn("__prev", F.lag("__t").over(Window.partitionBy("__u").orderBy(F.col("__ts"), F.col("__id"))))
    inner = base.filter(F.col("__prev").isNotNull()).select(
        F.col("__prev").alias("from_type"), F.col("__t").alias("to_type")
    )
    edges = inner
    if include_endpoints:
        nxt = F.lead("__t").over(Window.partitionBy("__u").orderBy(F.col("__ts"), F.col("__id")))
        firsts = base.filter(F.col("__prev").isNull()).select(
            F.lit("(start)").alias("from_type"), F.col("__t").alias("to_type")
        )
        lasts = (
            base.withColumn("__next", nxt)
            .filter(F.col("__next").isNull())
            .select(F.col("__t").alias("from_type"), F.lit("(end)").alias("to_type"))
        )
        edges = inner.unionByName(firsts).unionByName(lasts)
    return edges.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("transitions")
    )
