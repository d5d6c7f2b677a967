"""CLI, CSV sources, HTML sink, facade API, streaming, multimodal tests."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

import oaxaca_blinder_rs_spark as ob
from oaxaca_blinder_rs_spark.operators import multimodal
from oaxaca_blinder_rs_spark.sinks.report import to_html
from oaxaca_blinder_rs_spark.sources.csv import read_csv, read_csv_bytes
from oaxaca_blinder_rs_spark.streaming import events as streaming_events

WAGE_CSV = """wage,education,gender,sector
10.0,12.0,F,tech
12.0,16.0,F,admin
11.0,14.0,F,tech
13.0,16.0,F,admin
15.0,18.0,F,tech
20.0,12.0,M,tech
22.0,16.0,M,admin
21.0,14.0,M,tech
23.0,16.0,M,admin
25.0,18.0,M,tech
"""


@pytest.fixture(scope="module")
def wage_csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "wage.csv"
    p.write_text(WAGE_CSV)
    return str(p)


def test_read_csv_row_id(spark, wage_csv_path):
    df = read_csv(spark, wage_csv_path)
    rows = df.orderBy("__ob_row_id__").collect()
    assert [r["__ob_row_id__"] for r in rows] == list(range(10))
    assert rows[0]["wage"] == 10.0


def test_attach_row_ids_multipartition(spark):
    """Row ids are dense 0..n-1 in (partition, local) order without a global
    single-partition sort: the plan must contain no SinglePartition exchange
    and ids must follow partition scan order."""
    from oaxaca_blinder_rs_spark.sources.csv import attach_row_ids

    base = spark.range(0, 1000, 1, 8).select((F.col("id") * 2).alias("v"))
    out = attach_row_ids(base)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    ids = sorted(r["__ob_row_id__"] for r in out.collect())
    assert ids == list(range(1000))
    # ids are dense within each original partition and ordered by partition
    per_part = out.withColumn("__p", F.spark_partition_id()).collect()
    by_part = {}
    for r in per_part:
        by_part.setdefault(r["__p"], []).append(r["__ob_row_id__"])
    ranges = sorted((min(v), max(v), len(v)) for v in by_part.values())
    prev_end = -1
    for lo, hi, n in ranges:
        assert lo == prev_end + 1 and hi - lo + 1 == n
        prev_end = hi


def test_read_csv_bytes(spark):
    df = read_csv_bytes(spark, WAGE_CSV.encode())
    assert df.count() == 10
    assert "wage" in df.columns


def test_cli_run_and_report(spark, wage_csv_path, tmp_path, capsys):
    """cli_test.rs:1-101 analogue: end-to-end CLI invocation, table headings
    appear; report writes HTML."""
    from oaxaca_blinder_rs_spark.cli import main

    rc = main([
        "run", "--data", wage_csv_path, "--outcome", "wage", "--group", "gender",
        "--reference", "F", "--predictors", "education", "--bootstrap-reps", "5",
        "--output-json", str(tmp_path / "res.json"),
        "--output-markdown", str(tmp_path / "res.md"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Oaxaca-Blinder Decomposition Results" in out
    assert "Two-Fold Decomposition" in out
    assert (tmp_path / "res.json").exists()
    assert (tmp_path / "res.md").read_text().startswith("### Oaxaca")

    html_path = tmp_path / "report.html"
    rc = main([
        "report", "--data", wage_csv_path, "--outcome", "wage", "--group", "gender",
        "--reference", "F", "--predictors", "education", "--bootstrap-reps", "5",
        "--output", str(html_path),
    ])
    assert rc == 0
    html = html_path.read_text()
    assert "<h1>Oaxaca-Blinder Decomposition Report</h1>" in html
    assert "Two-Fold" in html


def test_facade_api(spark, wage_csv_path):
    df = read_csv(spark, wage_csv_path)
    model = ob.OaxacaBlinder(df, "wage", "gender", "F", predictors=["education"], bootstrap_reps=5)
    res = model.fit()
    assert abs(res.total_gap - 10.0) < 1e-9
    assert "<h1>" in to_html(res)
    rif = model.fit_quantile(0.5)
    assert rif.n_a == 5


def test_streaming_windowed_aggregates(spark, sf_dir, tmp_path):
    """Structured Streaming over the events table with availableNow trigger.

    The raw driver parquet has nanos timestamps Spark can't scan, so the test
    first rewrites it via load_table (pyarrow fallback) to a us-timestamp
    copy, then streams that — the realistic ingest path.
    """
    import tempfile

    static = ob.load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_us")
    static.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(static.schema).format("parquet").load(src)
    agg = streaming_events.windowed_event_aggregates(stream, "1 hour", "2 hours")
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName("evt_agg")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    out = spark.sql("SELECT * FROM evt_agg")
    # append mode emits only watermark-closed windows; verify shape + sanity
    rows = out.collect()
    assert len(rows) > 0
    assert {"window_start", "event_type", "n_events"}.issubset(set(out.columns))
    total_closed = sum(r["n_events"] for r in rows)
    assert total_closed <= static.count()


def test_streaming_sessionize_plan(spark, sf_dir, tmp_path):
    static = ob.load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_us2")
    static.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(static.schema).format("parquet").load(src)
    sess = streaming_events.sessionize(stream)
    assert sess.isStreaming


def test_streaming_dedup_collapses_duplicates(spark, sf_dir, tmp_path):
    """streaming_dedup over a source holding every event twice (the same
    parquet written into two files) must emit each event_id exactly once,
    with bounded per-key state (dropDuplicatesWithinWatermark)."""
    import tempfile

    static = ob.load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_dup")
    static.write.mode("overwrite").parquet(src)
    static.write.mode("append").parquet(src)  # exact duplicates of every row
    stream = spark.readStream.schema(static.schema).format("parquet").load(src)
    deduped = streaming_events.streaming_dedup(stream, ["event_id"])
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            deduped.writeStream.format("memory")
            .queryName("evt_dedup")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    out = spark.sql("SELECT event_id FROM evt_dedup")
    n_unique = static.select("event_id").distinct().count()
    assert out.count() == n_unique
    assert out.distinct().count() == n_unique


def test_multimodal_features(spark):
    rows = [(i, bytes([i]) * 64, "image/png", 8, 8, None) for i in range(20)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with_meta = multimodal.attach_media_metadata(df)
    metas = {r["media_id"]: r for r in with_meta.collect()}
    assert metas[1]["payload_bytes"] == 64
    feats = multimodal.extract_features(df).collect()
    assert len(feats) == 20
    f1 = next(r for r in feats if r["media_id"] == 1)["features"]
    assert len(f1) == 16
    # deterministic: rerun matches
    feats2 = multimodal.extract_features(df).collect()
    f1b = next(r for r in feats2 if r["media_id"] == 1)["features"]
    assert f1 == f1b


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"x", "image/png")


def test_multimodal_codec_gate_without_pil():
    """In this container PIL is absent: the gate must report no codec and
    resolve to the deterministic fake."""
    assert multimodal.codec_available("image") is False
    assert multimodal.resolve_decoder("image") is multimodal.deterministic_fake_features
    # extract_features(decode_fn=None) rides the gate to the fake kernel
    assert multimodal.codec_available("audio") is False  # only image is gated


def test_multimodal_codec_gate_with_fake_pil(monkeypatch):
    """Real-kernel branch: inject a minimal PIL stub into sys.modules so the
    gate flips and decode_image_features runs its actual decode/resize/
    normalize pipeline against a known 4x4 grayscale 'image'."""
    import sys
    import types

    import numpy as np

    class FakeImg:
        def __init__(self, px):
            self._px = px

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, size):
            assert size == (4, 4)  # sqrt(16)
            return self

        def __array__(self, dtype=None, copy=None):
            a = np.array(self._px, dtype=dtype or np.float64)
            return a.copy() if copy else a

    def fake_open(buf):
        data = buf.read()
        px = [[data[(r * 4 + c) % len(data)] for c in range(4)] for r in range(4)]
        return FakeImg(px)

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = fake_open
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    assert multimodal.codec_available("image") is True
    assert multimodal.resolve_decoder("image") is multimodal.decode_image_features
    payload = bytes(range(16))
    feats = multimodal.decode_image_features(payload, "image/png", dim=16)
    assert feats == [i / 255.0 for i in range(16)]  # decoded, not hashed
    # and it differs from the fake's hash-derived vector
    assert feats != multimodal.deterministic_fake_features(payload, "image/png", 16)


def test_plot_data_and_plot_guard(spark, wage_csv_path):
    df = read_csv(spark, wage_csv_path)
    res = ob.OaxacaBlinder(df, "wage", "gender", "F", predictors=["education"], bootstrap_reps=5).fit()
    d = res.plot_data("two_fold")
    assert d["labels"] == ["explained", "unexplained"]
    assert len(d["estimates"]) == 2
    try:
        import matplotlib  # noqa: F401
        has_mpl = True
    except ImportError:
        has_mpl = False
    if not has_mpl:
        # dependency-free SVG fallback: same series, bars + CI whiskers
        fig = res.plot("two_fold")
        from oaxaca_blinder_rs_spark.results import SvgFigure

        assert isinstance(fig, SvgFigure)
        assert fig.svg.startswith("<svg") and fig.svg.rstrip().endswith("</svg>")
        for label in d["labels"]:
            assert label in fig.svg
        assert "<title>" in fig.svg  # native hover tooltips per bar
        assert fig._repr_svg_() == fig.svg


def test_plot_svg_save_and_signed_colors(spark, wage_csv_path, tmp_path):
    df = read_csv(spark, wage_csv_path)
    res = ob.OaxacaBlinder(df, "wage", "gender", "F", predictors=["education"], bootstrap_reps=10).fit()
    try:
        import matplotlib  # noqa: F401

        return  # matplotlib path covered by the reference surface
    except ImportError:
        pass
    fig = res.plot("three_fold")
    p = tmp_path / "chart.svg"
    fig.save(str(p))
    svg = p.read_text()
    assert svg == fig.svg
    d = res.plot_data("three_fold")
    # sign -> pole color: any negative estimate paints the warm pole
    if any(e < 0 for e in d["estimates"]):
        assert "#e34948" in svg
    if any(e >= 0 for e in d["estimates"]):
        assert "#2a78d6" in svg


def test_streaming_stateful_decomposition(spark, sf_dir, tmp_path):
    """applyInPandasWithState: running Gram state per group across
    micro-batches; the converged beta matches the batch OLS."""
    import tempfile

    from oaxaca_blinder_rs_spark.functions.linalg import collect_group_stats, ols_from_stats

    li = ob.load_table(spark, sf_dir, "lineitem").limit(2000).select(
        "l_returnflag",
        F.col("l_extendedprice").alias("y"),
        F.lit(1.0).alias("i"),
        F.col("l_quantity").alias("x"),
    )
    src = str(tmp_path / "li_stream")
    li.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(li.schema).format("parquet").load(src)
    out = streaming_events.streaming_decomposition_stats(stream, "l_returnflag", "y", ["i", "x"])
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            out.writeStream.format("memory").queryName("dec_state")
            .outputMode("update").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
    rows = {r["group"]: r for r in spark.sql(
        "SELECT * FROM dec_state").collect()}
    assert rows, "stateful op emitted nothing"
    # compare the streamed beta for one group against batch OLS
    gval = sorted(rows)[0]
    batch = li.filter(F.col("l_returnflag") == gval)
    stats = collect_group_stats(batch, ["i", "x"], "y")
    fit = ols_from_stats(stats)
    streamed = rows[gval]["beta"]
    assert len(streamed) == 2
    assert abs(streamed[0] - fit.beta[0]) < 1e-4
    assert abs(streamed[1] - fit.beta[1]) < 1e-4
    assert rows[gval]["n"] == stats.n


def test_multimodal_resize_fake_path(spark):
    """resize_images via the deterministic fake: schema, sizes, determinism."""
    rows = [(i, bytes([i]) * 64, "image/png", 8, 8, None) for i in range(10)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(df, 4, 4).collect()
    assert len(out) == 10
    by_id = {r["media_id"]: r for r in out}
    assert all(r["width"] == 4 and r["height"] == 4 for r in out)
    assert all(len(r["payload"]) == 16 for r in out)
    out2 = multimodal.resize_images(df, 4, 4).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in out2} == {
        k: bytes(v["payload"]) for k, v in by_id.items()
    }
    # different target size -> different deterministic payloads
    other = {r["media_id"]: bytes(r["payload"]) for r in multimodal.resize_images(df, 2, 2).collect()}
    assert other[1] != bytes(by_id[1]["payload"])


def test_multimodal_resize_injected_kernel():
    """The real-kernel contract: a custom resize_fn sees (payload, mime, w, h)."""
    calls = []

    def fn(p, m, w, h):
        calls.append((bytes(p), m, w, h))
        return b"resized"

    import oaxaca_blinder_rs_spark as ob

    spark = ob.get_spark("t-resize")
    rows = [(1, b"abc", "image/png", 8, 8, None)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(df, 3, 5, resize_fn=fn).collect()
    assert bytes(out[0]["payload"]) == b"resized"


def test_multimodal_sample_frames(spark):
    """Frame sampling: cadence, cap, and the one-frame floor for missing or
    zero durations; deterministic fake frames."""
    rows = [
        (1, b"videobytes", "video/mp4", None, None, 3500),
        (2, b"other", "video/mp4", None, None, 0),
        (3, b"third", "video/mp4", None, None, None),
        (4, b"long", "video/mp4", None, None, 10_000_000),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.sample_frames(df, every_ms=1000, max_frames=5).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert sorted(r["ts_ms"] for r in by_id[1]) == [0, 1000, 2000, 3000]
    assert len(by_id[2]) == 1 and by_id[2][0]["ts_ms"] == 0
    assert len(by_id[3]) == 1
    assert len(by_id[4]) == 5  # capped
    f = by_id[1][0]
    assert bytes(f["frame"]) == multimodal.deterministic_fake_frame(b"videobytes", f["ts_ms"])


def test_read_jsonl(spark, tmp_path):
    """JSONL ingest: schema-pinned read, stable shuffle-free row ids, and
    corrupt-line quarantine via the PERMISSIVE corrupt column."""
    from oaxaca_blinder_rs_spark.sources.jsonl import read_jsonl

    p = tmp_path / "docs.jsonl"
    lines = [f'{{"doc_id": {i}, "text": "doc number {i}"}}' for i in range(50)]
    lines[25] = '{"doc_id": 25, "text": unquoted garbage}'
    p.write_text("\n".join(lines) + "\n")

    df = read_jsonl(
        spark,
        str(p),
        schema="doc_id long, text string, _bad string",
        corrupt_col="_bad",
    )
    rows = df.collect()
    assert len(rows) == 50
    ids = sorted(r["__ob_row_id__"] for r in rows)
    assert ids == list(range(50))
    bad = [r for r in rows if r["_bad"] is not None]
    assert len(bad) == 1 and "unquoted" in bad[0]["_bad"]
    good = {r["doc_id"]: r["text"] for r in rows if r["_bad"] is None}
    assert good[10] == "doc number 10"


def test_streaming_corpus_gate(spark, tmp_path):
    """Streaming ingest gate: quality + language filtering plus
    watermark-bounded fingerprint dedup, end-to-end with availableNow."""
    import tempfile
    from datetime import datetime, timedelta

    good = (
        "the cat and the dog went to the market, and it was a fine day for "
        "all of them. the weather is that kind of thing that is on with as "
        "was at by an be this are; they walked for a while in the sun. "
        "the cat and the dog came back to the house and it was good."
    )
    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (0, good, t0),
        (1, good, t0 + timedelta(minutes=5)),              # dup fingerprint
        (2, "short junk", t0),                             # quality gate
        (3, "der die das und ist nicht ein eine zu mit " * 12, t0),  # lang gate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    src = str(tmp_path / "docs_stream")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).format("parquet").load(src)
    gated = streaming_events.streaming_corpus_gate(stream)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            gated.writeStream.format("memory").queryName("corpus_gate")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
    out = spark.sql("SELECT * FROM corpus_gate").collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [0] or ids == [1]  # exactly one of the duplicate pair
    assert out[0]["lang"] == "en" and out[0]["quality"] >= 0.5
    assert out[0]["fingerprint"]


def test_write_sized_parquet(spark, sf_dir, tmp_path):
    """Size-targeted parquet sink: file count tracks the measured
    bytes-per-row against the target, rows round-trip, and empty frames
    write a valid empty dataset."""
    import glob

    from oaxaca_blinder_rs_spark.sinks.parquet import write_sized_parquet

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out_dir = str(tmp_path / "sized")
    stats = write_sized_parquet(docs, out_dir, target_file_mb=0.02)
    files = glob.glob(f"{out_dir}/*.parquet")
    assert stats["rows"] == docs.count()
    assert stats["files"] == len(files) > 1  # 0.02 MB target forces a split
    back = spark.read.parquet(out_dir)
    assert back.count() == stats["rows"]
    assert sorted(back.columns) == sorted(docs.columns)

    empty = spark.createDataFrame([], "doc_id long, text string")
    st2 = write_sized_parquet(empty, str(tmp_path / "empty"))
    assert st2 == {"rows": 0, "files": 0, "bytes_per_row": 0.0}
    assert spark.read.parquet(str(tmp_path / "empty")).count() == 0


def test_streaming_enrich_last_state_two_batches(spark, tmp_path):
    """Streaming as-of enrichment: within-batch inclusive ordering and the
    per-key register carrying across separately-triggered batches (same
    checkpoint, second run sees only the new file)."""
    import tempfile
    from datetime import datetime

    def ts(s):
        return datetime(2026, 1, 1, 0, 0, s)

    schema = "user_id long, ts timestamp, kind string, value double"
    src = str(tmp_path / "enrich_stream")
    ckpt = str(tmp_path / "enrich_ckpt")
    batch1 = spark.createDataFrame(
        [
            (1, ts(5), "state", 10.0),
            (1, ts(7), "event", 0.0),   # -> 10.0
            (1, ts(9), "state", 20.0),
            (2, ts(3), "event", 0.0),   # no state yet -> null
        ],
        schema,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(src)

    out_dir = str(tmp_path / "enrich_out")

    def run_once():
        stream = spark.readStream.schema(batch1.schema).format("parquet").load(src)
        out = streaming_events.streaming_enrich_last_state(stream)
        # parquet sink: supports checkpoint recovery (memory sink does not)
        q = (
            out.writeStream.format("parquet").option("path", out_dir)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_once()
    first = {(r["user_id"], r["ts"]): r for r in spark.read.parquet(out_dir).collect()}
    assert first[(1, ts(7))]["asof_value"] == 10.0
    assert first[(2, ts(3))]["asof_value"] is None

    # second batch: event for user 1 must see the register carried from run 1
    batch2 = spark.createDataFrame([(1, ts(20), "event", 0.0)], schema)
    batch2.coalesce(1).write.mode("append").parquet(src)
    run_once()
    rows = {(r["user_id"], r["ts"]): r for r in spark.read.parquet(out_dir).collect()}
    assert rows[(1, ts(20))]["asof_value"] == 20.0
    assert rows[(1, ts(20))]["asof_ts"] == ts(9)


def test_cli_corpus_verb(spark, sf_dir, tmp_path, capsys):
    """The corpus CLI verb: keep-list mode and packed-shard mode both write
    parquet and print one JSON stats line."""
    import glob
    import json as _json

    from oaxaca_blinder_rs_spark.cli import main

    src = f"{sf_dir}/documents.parquet"
    out1 = str(tmp_path / "keep")
    assert main(["corpus", "--input", src, "--output", out1]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_in"] > stats["docs_kept"] > 0
    assert spark.read.parquet(out1).count() == stats["docs_kept"]

    out2 = str(tmp_path / "shards")
    assert main([
        "corpus", "--input", src, "--output", out2,
        "--pack-budget", "1500", "--scrub-pii",
    ]) == 0
    stats2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["shards"] > 1 and stats2["total_tokens"] > 0
    back = spark.read.parquet(out2)
    assert back.count() == stats2["docs_kept"]
    assert "text" in back.columns and "shard_id" in back.columns


def test_cli_corpus_nondefault_text_col(spark, sf_dir, tmp_path, capsys):
    """--scrub-pii + --pack-budget with a non-default --text-col: shards must
    carry the scrubbed text under the caller's column name, not literal
    'text' (round-5 ADVICE regression)."""
    import json as _json

    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.cli import main

    src = str(tmp_path / "docs_body.parquet")
    spark.read.parquet(f"{sf_dir}/documents.parquet").withColumnRenamed(
        "text", "body"
    ).write.parquet(src)
    out = str(tmp_path / "shards_body")
    assert main([
        "corpus", "--input", src, "--output", out,
        "--text-col", "body", "--scrub-pii", "--pack-budget", "1500",
    ]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    back = spark.read.parquet(out)
    assert back.count() == stats["docs_kept"] > 0
    assert "body" in back.columns and "text" not in back.columns


def test_streaming_enrich_register_forward_only(spark, tmp_path):
    """A late state row OLDER than the stored register must not move the
    register backward nor override enrichment (round-5 ADVICE regression)."""
    from datetime import datetime

    def ts(s):
        return datetime(2026, 1, 1, 0, 0, s)

    schema = "user_id long, ts timestamp, kind string, value double"
    src = str(tmp_path / "fwd_stream")
    ckpt = str(tmp_path / "fwd_ckpt")
    out_dir = str(tmp_path / "fwd_out")
    batch1 = spark.createDataFrame([(1, ts(10), "state", 50.0)], schema)
    batch1.coalesce(1).write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(batch1.schema).format("parquet").load(src)
        out = streaming_events.streaming_enrich_last_state(stream)
        q = (
            out.writeStream.format("parquet").option("path", out_dir)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_once()
    # batch 2: a LATE state row at ts(2) (older than the ts(10) register)
    # followed by an event at ts(30): must be enriched from the register,
    # and the register must stay at (ts(10), 50.0) afterwards.
    batch2 = spark.createDataFrame(
        [(1, ts(2), "state", 5.0), (1, ts(30), "event", 0.0)], schema
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    run_once()
    rows = {(r["user_id"], r["ts"]): r for r in spark.read.parquet(out_dir).collect()}
    assert rows[(1, ts(30))]["asof_value"] == 50.0
    assert rows[(1, ts(30))]["asof_ts"] == ts(10)

    # batch 3: another event — register must still be (ts(10), 50.0)
    batch3 = spark.createDataFrame([(1, ts(40), "event", 0.0)], schema)
    batch3.coalesce(1).write.mode("append").parquet(src)
    run_once()
    rows = {(r["user_id"], r["ts"]): r for r in spark.read.parquet(out_dir).collect()}
    assert rows[(1, ts(40))]["asof_value"] == 50.0
    assert rows[(1, ts(40))]["asof_ts"] == ts(10)


def test_weighted_sample_expected_size_and_shape(spark, sf_dir):
    """weighted_sample (r6): expected size ~ fraction*n, high-weight rows
    overrepresented, membership deterministic, and the plan is a map-side
    filter over a broadcast scalar (no data shuffle)."""
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "__w", F.length("text").cast("double")
    )
    n = docs.count()
    out = sampling.weighted_sample(docs, "__w", 0.3)
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    k = len(ids1)
    assert abs(k - 0.3 * n) < 0.15 * n
    ids2 = {r["doc_id"] for r in sampling.weighted_sample(docs, "__w", 0.3).select("doc_id").collect()}
    assert ids1 == ids2
    # longer docs are kept at a higher rate WITHIN the one sample (weights
    # normalize by the full frame's mean, so subsetting first would
    # re-normalize and equalize the rates)
    med = docs.approxQuantile("__w", [0.5], 0.01)[0]
    hi_ids = {r["doc_id"] for r in docs.filter(F.col("__w") > med).select("doc_id").collect()}
    lo_ids = {r["doc_id"] for r in docs.filter(F.col("__w") <= med).select("doc_id").collect()}
    hi_rate = len(ids1 & hi_ids) / max(len(hi_ids), 1)
    lo_rate = len(ids1 & lo_ids) / max(len(lo_ids), 1)
    assert hi_rate > lo_rate
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    import pytest

    with pytest.raises(ValueError):
        sampling.weighted_sample(docs, "__w", -0.1)


def test_streaming_hll_registers_matches_batch(spark, sf_dir, tmp_path):
    """Streaming HLL (r6): the per-window register stream, merged across
    windows by groupBy(register).max(rho), must equal the BATCH sketch of
    the same data — the mergeability contract, end-to-end through a real
    availableNow streaming query."""
    import tempfile

    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators import sketches

    static = ob.load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_hll")
    static.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(static.schema).format("parquet").load(src)
    regs = streaming_events.streaming_hll_registers(stream, "user_id", p=6, watermark="0 seconds")
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            regs.writeStream.format("memory")
            .queryName("hll_regs")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    out = spark.sql("SELECT register, rho FROM hll_regs")
    merged = {r["register"]: r["rho"]
              for r in out.groupBy("register").agg(F.max("rho").alias("rho")).collect()}
    batch = {
        r["register"]: r["rho"]
        for r in sketches.hll_registers(
            static.select(F.col("user_id").cast("string").alias("u")), "u", p=6
        ).filter(F.col("rho") > 0).collect()
    }
    assert merged == batch


def test_streaming_cms_cells_matches_batch(spark, sf_dir, tmp_path):
    """Streaming count-min (r6): per-window cell stream merged across
    windows by per-cell sum equals the batch sketch of the same data —
    end-to-end through a real availableNow query."""
    import tempfile

    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators import sketches

    static = ob.load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_cms")
    static.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(static.schema).format("parquet").load(src)
    cells = streaming_events.streaming_cms_cells(stream, "user_id", w=256, d=2, watermark="0 seconds")
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            cells.writeStream.format("memory")
            .queryName("cms_cells")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    out = spark.sql("SELECT row, col, cnt FROM cms_cells")
    merged = {(r["row"], r["col"]): r["cnt"]
              for r in out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt")).collect()}
    batch = {(r["row"], r["col"]): r["cnt"]
             for r in sketches.cms_table(
                 static.select(F.col("user_id").alias("user_id")), "user_id", w=256, d=2
             ).collect()}
    assert merged == batch


def test_streaming_histogram_cells_matches_batch(spark, sf_dir, tmp_path):
    """Streaming equi-width histogram (r7): per-window bin counts merged
    across windows by per-bin sum equal the batch histogram of the same
    data over the same fixed bounds — end-to-end through a real
    availableNow query. This is the distribution tracker that feeds
    histogram_quantiles without a sort."""
    import tempfile

    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.profiling import equi_width_histogram

    static = ob.load_table(spark, sf_dir, "events")
    lo, hi = 0.0, 500.0
    src = str(tmp_path / "events_hist")
    static.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(static.schema).format("parquet").load(src)
    cells = streaming_events.streaming_histogram_cells(
        stream, "value", lo=lo, hi=hi, bins=32, watermark="0 seconds"
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            cells.writeStream.format("memory")
            .queryName("hist_cells")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    out = spark.sql("SELECT bin, n FROM hist_cells")
    merged = {r["bin"]: r["n"]
              for r in out.groupBy("bin").agg(F.sum("n").alias("n")).collect()}
    batch = {r["bin"]: r["n"]
             for r in equi_width_histogram(static, "value", 32, lo, hi).filter(
                 F.col("n") > 0
             ).collect()}
    assert merged == batch


def test_streaming_drift_cells_matches_batch_psi(spark, sf_dir, tmp_path):
    """Streaming drift (r7): per-window (dim, bucket) cells merged across
    windows by SUM, fed through psi_from_counts against the reference
    snapshot's drift_bucket_counts, must equal the batch drift_report of
    the same split over the same fixed bounds — the continuous-PSI
    pipeline, end-to-end through a real availableNow query."""
    import tempfile

    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.profiling import (
        drift_bucket_counts,
        drift_report,
        psi_from_counts,
    )

    static = ob.load_table(spark, sf_dir, "events")
    cut = "2024-01-16"
    ref = static.filter(F.col("ts") < cut)
    live = static.filter(F.col("ts") >= cut)
    lo, hi = static.agg(F.min("value"), F.max("value")).collect()[0]
    bounds = {"value": (float(lo), float(hi))}

    src = str(tmp_path / "events_drift")
    live.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(live.schema).format("parquet").load(src)
    cells = streaming_events.streaming_drift_cells(
        stream, cat_cols=["event_type"], num_cols=["value"],
        bins=10, bounds=bounds, watermark="0 seconds",
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            cells.writeStream.format("memory")
            .queryName("drift_cells")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    live_counts = spark.sql(
        "SELECT dim, bucket, SUM(n) AS n FROM drift_cells GROUP BY 1, 2"
    )
    ref_counts = drift_bucket_counts(
        ref, cat_cols=["event_type"], num_cols=["value"], bins=10, bounds=bounds
    )
    got = {
        (r.dim, r.bucket): (r.n_a, r.n_b, r.share_a, r.share_b, r.psi)
        for r in psi_from_counts(ref_counts, live_counts).collect()
    }
    want = {
        (r.dim, r.bucket): (r.n_a, r.n_b, r.share_a, r.share_b, r.psi)
        for r in drift_report(
            ref, live, cat_cols=["event_type"], num_cols=["value"],
            bins=10, bounds=bounds,
        ).collect()
    }
    assert got == want


def test_streaming_drift_cells_requires_bounds(spark, sf_dir):
    import pytest as _pytest

    static = ob.load_table(spark, sf_dir, "events")
    stream_like = static  # validation happens before any streaming API call
    with _pytest.raises(ValueError):
        streaming_events.streaming_drift_cells(stream_like, num_cols=["value"])


def test_cli_quality_verb(spark, sf_dir, tmp_path, capsys):
    """The quality CLI verb: JSON rules in, one line per rule out, JSON
    results file, and --fail-on-violation as the CI-gate exit code."""
    import json as _json

    from oaxaca_blinder_rs_spark.cli import main

    rules = [
        {"type": "not_null", "col": "l_orderkey"},
        {"type": "unique", "cols": ["l_orderkey", "l_linenumber"]},
        {"type": "foreign_key", "col": "l_orderkey",
         "ref_path": f"{sf_dir}/orders.parquet", "ref_col": "o_orderkey"},
        {"type": "range", "col": "l_discount", "lo": 0.0, "hi": 0.01},
    ]
    rp = tmp_path / "rules.json"
    rp.write_text(_json.dumps(rules))
    outj = tmp_path / "quality.json"
    rc = main([
        "quality", "--input", f"{sf_dir}/lineitem.parquet",
        "--rules", str(rp), "--output-json", str(outj),
        "--fail-on-violation",
    ])
    assert rc == 1  # the tight discount range must fail
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("[")]
    assert len(lines) == 4
    rows = {r["constraint"]: r for r in _json.loads(outj.read_text())}
    assert rows["not_null"]["ok"] and rows["foreign_key"]["ok"]
    # the driver's synthetic lineitem genuinely repeats (orderkey,
    # linenumber) pairs (see NOTES_r7 rank-pinning) — the unique rule
    # must surface that, not mask it
    assert not rows["unique"]["ok"] and rows["unique"]["violations"] > 0
    assert not rows["range"]["ok"] and rows["range"]["violations"] > 0

    # gate passes (rc 0) when every rule holds
    rp2 = tmp_path / "rules2.json"
    rp2.write_text(_json.dumps([{"type": "not_null", "col": "l_orderkey"}]))
    assert main([
        "quality", "--input", f"{sf_dir}/lineitem.parquet",
        "--rules", str(rp2), "--fail-on-violation",
    ]) == 0


def test_streaming_constraint_cells_matches_batch(spark, sf_dir, tmp_path):
    """Streaming constraints (r7): per-window violation cells merged across
    windows by SUM equal the batch check_constraints counts over the same
    data; stateful rules are rejected with a clear error."""
    import tempfile

    import pytest as _pytest
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.quality import check_constraints

    static = ob.load_table(spark, sf_dir, "events")
    rules = [
        {"type": "not_null", "col": "user_id"},
        {"type": "range", "col": "value", "lo": 0.0, "hi": 100.0},
        {"type": "in_set", "col": "event_type", "values": ["click", "view"]},
        {"type": "predicate", "expr": "value >= 0"},
    ]
    src = str(tmp_path / "events_cc")
    static.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(static.schema).format("parquet").load(src)
    cells = streaming_events.streaming_constraint_cells(
        stream, rules, watermark="0 seconds"
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            cells.writeStream.format("memory")
            .queryName("cc_cells")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    merged = {
        (r.constraint, r.detail): (r.violations, r.n)
        for r in spark.sql(
            "SELECT constraint, detail, SUM(violations) AS violations, SUM(n) AS n "
            "FROM cc_cells GROUP BY 1, 2"
        ).collect()
    }
    batch = {
        (r.constraint, r.detail): (r.violations, r.n)
        for r in check_constraints(static, rules).collect()
    }
    assert merged == batch
    with _pytest.raises(ValueError, match="not streamable"):
        streaming_events.streaming_constraint_cells(
            static, [{"type": "unique", "cols": ["event_id"]}]
        )


def test_streaming_drift_cells_checkpoint_recovery(spark, sf_dir, tmp_path):
    """Drift cells survive a stop/restart: run 1 processes the first
    half-month, run 2 (same checkpoint) sees ONLY the appended second half
    — no window is double-counted, the boundary window's partial counts
    carry in state across the restart, and every emitted (window, dim,
    bucket) row equals the batch bucketing of the same data. Append mode
    may hold back only the final (never-closed) window."""
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.profiling import drift_bucket_counts

    static = ob.load_table(spark, sf_dir, "events")
    lo, hi = static.agg(F.min("value"), F.max("value")).collect()[0]
    bounds = {"value": (float(lo), float(hi))}
    cut = "2024-01-16"
    src = str(tmp_path / "drift_src")
    ckpt = str(tmp_path / "drift_ckpt")
    out_dir = str(tmp_path / "drift_out")
    static.filter(F.col("ts") < cut).coalesce(1).write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(static.schema).format("parquet").load(src)
        cells = streaming_events.streaming_drift_cells(
            stream, cat_cols=["event_type"], num_cols=["value"],
            bins=10, bounds=bounds, window_duration="1 day", watermark="0 seconds",
        )
        q = (
            cells.writeStream.format("parquet").option("path", out_dir)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_once()
    n_first = spark.read.parquet(out_dir).count()
    static.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = spark.read.parquet(out_dir)
    # no duplicated (window, dim, bucket) across the two runs
    assert got.count() == got.select("window_start", "dim", "bucket").distinct().count()
    assert got.count() > n_first
    # every emitted window matches the batch bucketing of that window's rows
    emitted = [r["window_start"] for r in got.select("window_start").distinct().collect()]
    for ws in emitted:
        we = {r["window_start"] for r in got.collect() if r["window_start"] == ws}
        day = static.filter(
            (F.col("ts") >= F.lit(ws)) & (F.col("ts") < F.date_add(F.lit(ws), 1))
        )
        want = {
            (r.dim, r.bucket): r.n
            for r in drift_bucket_counts(
                day, cat_cols=["event_type"], num_cols=["value"], bins=10, bounds=bounds
            ).collect()
        }
        have = {
            (r.dim, r.bucket): r.n
            for r in got.filter(F.col("window_start") == ws).collect()
        }
        assert have == want, ws
    # only the final never-closed window may be withheld
    n_days = static.select(F.countDistinct(F.to_date("ts"))).collect()[0][0]
    assert len(emitted) >= n_days - 1


def test_cli_drift_verb(spark, sf_dir, tmp_path, capsys):
    """The drift CLI verb: per-dim PSI/JSD/KS lines, JSON output, and
    --max-psi as the CI gate (a self-comparison passes any bar; a skewed
    serving slice trips a tight one)."""
    import json as _json

    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.cli import main

    static = ob.load_table(spark, sf_dir, "events")
    ref = str(tmp_path / "ref")
    static.filter(F.col("ts") < "2024-01-16").write.parquet(ref)
    live = str(tmp_path / "live")
    # a deliberately skewed serving slice: only the highest-value events
    static.filter("value > 300").write.parquet(live)
    outj = tmp_path / "drift.json"
    rc = main([
        "drift", "--input", live, "--reference", ref,
        "--cat-cols", "event_type", "--num-cols", "value",
        "--output-json", str(outj), "--max-psi", "0.25",
    ])
    assert rc == 1  # the value dim must read as drifted
    rows = {r["dim"]: r for r in _json.loads(outj.read_text())}
    assert rows["value"]["psi"] > 0.25 and rows["value"]["ks"] is not None
    out = capsys.readouterr().out
    assert "DRIFT: worst psi" in out
    # self-comparison: zero drift, gate passes
    assert main([
        "drift", "--input", ref, "--reference", ref,
        "--cat-cols", "event_type", "--num-cols", "value", "--max-psi", "0.01",
    ]) == 0


def test_cli_drift_all_null_numeric_column_errors_cleanly(spark, tmp_path, capsys):
    """r7 advisory: an all-NULL numeric column made _run_drift's
    min/max-None comparison raise a bare TypeError; it must instead name
    the column and the offending side and exit 2."""
    from oaxaca_blinder_rs_spark.cli import main

    ref = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    live = spark.createDataFrame([(1, 1.0)], "id long, v double")
    ref_p, live_p = str(tmp_path / "refp"), str(tmp_path / "livep")
    ref.write.parquet(ref_p)
    live.write.parquet(live_p)
    rc = main(["drift", "--input", live_p, "--reference", ref_p, "--num-cols", "v"])
    assert rc == 2
    out = capsys.readouterr().out
    assert "'v'" in out and "reference" in out


def test_cli_match_output_json_weights_vector(spark, tmp_path, capsys):
    """main.rs:306-310 parity: `--analysis-type match --output-json` writes
    the weights VECTOR in input-row order; without --output-json the CLI
    prints the count + first-10 preview. Covers euclidean and psm."""
    import json as _json

    from oaxaca_blinder_rs_spark.cli import main

    csv = tmp_path / "treat.csv"
    csv.write_text(
        "y,x1,treated\n"
        "10.0,1.0,1\n10.5,1.1,1\n20.0,5.0,1\n"
        "10.1,1.05,0\n19.5,4.9,0\n30.0,9.0,0\n"
    )
    out = tmp_path / "w_euclid.json"
    rc = main([
        "run", "--data", str(csv), "--outcome", "y", "--group", "treated",
        "--reference", "0", "--analysis-type", "match", "--predictors", "x1",
        "--k-neighbors", "1", "--output-json", str(out),
    ])
    assert rc == 0
    weights = _json.loads(out.read_text())
    # rows 0-2 treated (weight 1.0); controls: row 3 matches rows 0+1
    # (x1 nearest), row 4 matches row 2, row 5 unmatched
    assert weights == [1.0, 1.0, 1.0, 2.0, 1.0, 0.0]

    out_psm = tmp_path / "w_psm.json"
    rc = main([
        "run", "--data", str(csv), "--outcome", "y", "--group", "treated",
        "--reference", "0", "--analysis-type", "match", "--predictors", "x1",
        "--matching-method", "psm", "--k-neighbors", "1",
        "--output-json", str(out_psm),
    ])
    assert rc == 0
    w_psm = _json.loads(out_psm.read_text())
    assert len(w_psm) == 6 and w_psm[:3] == [1.0, 1.0, 1.0]
    assert sum(w_psm[3:]) == pytest.approx(3.0)  # 3 treated, k=1 -> 3 units

    rc = main([
        "run", "--data", str(csv), "--outcome", "y", "--group", "treated",
        "--reference", "0", "--analysis-type", "match", "--predictors", "x1",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "Matching completed. Generated 6 weights." in printed
    assert "First 10 weights:" in printed


def test_formula_requires_predictors():
    """formula.rs:49-53 parity: an RHS with no usable terms raises
    InvalidGroupVariable('No predictors specified')."""
    from oaxaca_blinder_rs_spark.errors import InvalidGroupVariable
    from oaxaca_blinder_rs_spark.formula import Formula

    with pytest.raises(InvalidGroupVariable, match="No predictors specified"):
        Formula.parse("wage ~ ")
    # still fine with at least one term of either kind
    assert Formula.parse("wage ~ C(sector)").categorical_predictors == ["sector"]


def test_streaming_vocab_cells_matches_batch(spark, sf_dir, tmp_path):
    """Streaming vocabulary cells (r8): per-window (source, token) counts
    SUM-merged across windows must equal the batch vocab_stats (by, token)
    count table — so TTR / hapax / top-token computed from merged cells
    equal the batch report, end-to-end through a real availableNow query."""
    import tempfile

    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators.textops import vocab_stats

    docs = ob.load_table(spark, sf_dir, "documents").withColumn(
        "ts",
        F.to_timestamp(
            F.concat(F.lit("2024-01-01 00:"), F.lpad(F.col("doc_id") % 50, 2, "0"), F.lit(":00"))
        ),
    )
    src = str(tmp_path / "vocab_docs")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).format("parquet").load(src)
    cells = streaming_events.streaming_vocab_cells(
        stream, window_duration="10 minutes", watermark="0 seconds"
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            cells.writeStream.format("memory")
            .queryName("vocab_cells")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    merged = spark.sql(
        "SELECT source, token, SUM(n) AS cnt FROM vocab_cells GROUP BY 1, 2"
    )
    got = {
        r["source"]: r
        for r in merged.groupBy("source")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.round(F.count(F.lit(1)).cast("double") / F.sum("cnt"), 6).alias("ttr"),
        )
        .collect()
    }
    want = {r["source"]: r for r in vocab_stats(docs.drop("ts")).collect()}
    assert set(got) == set(want)
    for s_ in want:
        assert got[s_]["n_tokens"] == want[s_]["n_tokens"], s_
        assert got[s_]["n_types"] == want[s_]["n_types"], s_
        assert got[s_]["ttr"] == want[s_]["type_token_ratio"], s_
    # multiple windows actually occurred (the merge is doing real work)
    assert spark.sql("SELECT COUNT(DISTINCT window_start) c FROM vocab_cells").first()["c"] > 1


def test_cli_tokenize_verb(spark, sf_dir, tmp_path, capsys):
    """The tokenize CLI verb (r9): trains merges, writes the merge table +
    token-id table + encoded docs (or shards), prints one JSON stats line,
    and the artifacts are mutually consistent — encoded token totals equal
    the id table's frequency mass."""
    import json as _json

    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.cli import main

    src = f"{sf_dir}/documents.parquet"
    out1 = str(tmp_path / "tok")
    assert main([
        "tokenize", "--input", src, "--output", out1, "--merges", "6",
    ]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["merges"] == 6 and stats["vocab_tokens"] > 0
    assert stats["docs_encoded"] > 0
    merges = spark.read.parquet(f"{out1}/merges")
    assert merges.count() == 6
    ids = spark.read.parquet(f"{out1}/token_ids")
    enc = spark.read.parquet(f"{out1}/encoded")
    total_enc = enc.agg(F.sum("n_tokens")).collect()[0][0]
    total_freq = ids.agg(F.sum("freq")).collect()[0][0]
    assert total_enc == total_freq > 0

    out2 = str(tmp_path / "tok_shards")
    assert main([
        "tokenize", "--input", src, "--output", out2, "--merges", "4",
        "--pack-budget", "2000",
    ]) == 0
    stats2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["shards"] > 1 and stats2["total_tokens"] > 0
    back = spark.read.parquet(f"{out2}/shards")
    assert back.count() == stats2["docs_encoded"] == stats2["docs_in"]
    assert "shard_id" in back.columns


def test_streaming_mg_candidates_superset_and_exact_topk(spark, sf_dir, tmp_path):
    """Streaming Misra-Gries (r10): after an availableNow run over the
    events stream, (a) state/output is bounded by buckets x (capacity+1),
    (b) every key heavier than the summed eviction bound survives as a
    candidate (the MG guarantee, composed across hash buckets), and
    (c) feeding the streamed candidates into the batch exact-recount gives
    the true top-k — the sketch-then-verify contract end to end."""
    import tempfile

    static = ob.load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_mg")
    static.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(static.schema).format("parquet").load(src)
    summ = streaming_events.streaming_mg_candidates(
        stream, "user_id", capacity=32, n_buckets=8
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            summ.writeStream.format("memory")
            .queryName("mg_summ")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    out = spark.sql("SELECT bucket, key, mg_est FROM mg_summ").collect()
    assert len(out) <= 8 * 33 * 2  # bounded even if two micro-batches fired
    # keep only each bucket's LAST emission (update mode re-emits snapshots):
    # a later snapshot for a bucket supersedes earlier ones; with availableNow
    # over one directory there is one batch, but don't rely on that.
    survivors = {r["key"] for r in out if r["key"] is not None}
    u = sum(r["mg_est"] for r in out if r["key"] is None)
    exact = {
        r["k"]: r["n"]
        for r in static.select(F.col("user_id").cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    heavy = {k for k, n in exact.items() if n > u}
    assert heavy, "fixture too uniform for the guarantee to bite — lower capacity"
    assert heavy <= survivors
    # (c) exact recount of the streamed candidates == true top-k
    cand_df = spark.createDataFrame([(k,) for k in survivors], "key string")
    top = (
        static.select(F.col("user_id").cast("string").alias("key"))
        .join(F.broadcast(cand_df), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("key"))
        .limit(5)
        .collect()
    )
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [(r["key"], r["n"]) for r in top]
    if got[-1][1] > u:  # provably exact regime (mirrors the batch guard)
        assert got == want


def test_streaming_mg_candidates_state_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): the second batch's summary
    must include counts carried in state from the first — 'hot' appears
    only in file 1, stays a candidate after file 2 floods other keys."""
    import tempfile

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("v", StringType())])
    src = str(tmp_path / "mg_two_files")
    os.makedirs(src, exist_ok=True)
    f1 = spark.createDataFrame([("hot",)] * 50, schema)
    f2 = spark.createDataFrame([(f"k{i}",) for i in range(40)], schema)
    f1.coalesce(1).write.mode("append").parquet(src)
    f2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    summ = streaming_events.streaming_mg_candidates(stream, "v", capacity=16, n_buckets=2)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            summ.writeStream.format("memory")
            .queryName("mg_two")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM mg_two").collect()
    hot = [r["mg_est"] for r in rows if r["key"] == "hot"]
    assert hot and max(hot) == 50  # survived the flood with its full count
    with pytest.raises(ValueError):
        streaming_events.streaming_mg_candidates(
            spark.readStream.schema(schema).format("parquet").load(src), "v", capacity=0
        )


def test_cli_corpus_blocklist_gate(spark, sf_dir, tmp_path, capsys):
    """--blocklist drops every document containing a banned token BEFORE the
    quality gate, and composes with the rest of the pipeline (r10)."""
    import json as _json

    from oaxaca_blinder_rs_spark.cli import main
    from oaxaca_blinder_rs_spark.operators import textops
    from oaxaca_blinder_rs_spark.operators.corpus import prepare_corpus

    src = f"{sf_dir}/documents.parquet"
    bl = tmp_path / "banned.txt"
    bl.write_text("dup\n\nunsafe\n")  # blank line must be ignored
    out = str(tmp_path / "keep_bl")
    assert main(["corpus", "--input", src, "--output", out, "--blocklist", str(bl)]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    docs = spark.read.parquet(src)
    clean = textops.blocklist_filter(docs, ["dup", "unsafe"])
    expect = prepare_corpus(clean)
    assert stats["docs_kept"] == expect.count()
    # the gate really removed something at this fixture (dup ~5% of docs)
    baseline = prepare_corpus(docs)
    assert stats["docs_kept"] < baseline.count()
    # kept ids contain no banned token
    kept_ids = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    flagged = {
        r.doc_id
        for r in textops.blocklist_stats(docs, ["dup", "unsafe"]).where(~F.col("kept")).collect()
    }
    assert not (kept_ids & flagged)


def test_streaming_mg_candidates_checkpoint_recovery(spark, tmp_path):
    """The MG state blob survives a stop/restart: run 1 counts 'hot' 60x,
    run 2 (same checkpoint) sees only the appended file — the final summary
    must still carry hot's full 60+40 count, proving state (not output)
    crossed the restart."""
    import tempfile

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("v", StringType())])
    src = str(tmp_path / "mg_recovery_src")
    ckpt = str(tmp_path / "mg_recovery_ckpt")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame([("hot",)] * 60, schema).coalesce(1).write.mode("append").parquet(src)

    out_dir = str(tmp_path / "mg_recovery_out")

    def run_once():
        stream = spark.readStream.schema(schema).format("parquet").load(src)
        summ = streaming_events.streaming_mg_candidates(
            stream, "v", capacity=16, n_buckets=2, output_mode="append"
        )
        q = (
            summ.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = {r["key"]: r["mg_est"] for r in spark.read.parquet(out_dir).collect()}
    assert first.get("hot") == 60
    spark.createDataFrame([("hot",)] * 40, schema).coalesce(1).write.mode("append").parquet(src)
    run_once()
    rows = [r for r in spark.read.parquet(out_dir).collect() if r["key"] == "hot"]
    assert rows and max(r["mg_est"] for r in rows) == 100  # state crossed the restart


def test_cli_profile_verb(spark, sf_dir, tmp_path, capsys):
    """profile CLI verb (r10): one JSON line per column; --cols subset and
    --output-json both honored; values match profile_columns directly."""
    import json as _json

    from oaxaca_blinder_rs_spark.cli import main
    from oaxaca_blinder_rs_spark.operators.profiling import profile_columns

    src = f"{sf_dir}/documents.parquet"
    outj = str(tmp_path / "profile.json")
    assert main(["profile", "--input", src, "--cols", "lang,n_chars", "--output-json", outj]) == 0
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    rows = [_json.loads(ln) for ln in lines]
    assert [r["column"] for r in rows] == ["lang", "n_chars"]
    direct = {
        r["column"]: r.asDict()
        for r in profile_columns(spark.read.parquet(src), ["lang", "n_chars"]).collect()
    }
    for r in rows:
        assert r == direct[r["column"]]
    assert _json.load(open(outj)) == rows
    # default: every column
    assert main(["profile", "--input", src]) == 0
    all_lines = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    assert len(all_lines) == len(spark.read.parquet(src).columns)


def test_streaming_corpus_gate_blocklist(spark, tmp_path):
    """r10: the blocklist gate streams (stateless literal predicate) and
    composes with quality/lang/dedup; oversized lists are rejected."""
    import tempfile
    from datetime import datetime

    good = (
        "the cat and the dog went to the market, and it was a fine day for "
        "all of them. the weather is that kind of thing that is on with as "
        "was at by an be this are; they walked for a while in the sun. "
        "the cat and the dog came back to the house and it was good."
    )
    bad = good + " forbidden"
    t0 = datetime(2026, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(0, good, t0), (1, bad, t0)], "doc_id long, text string, ts timestamp"
    )
    src = str(tmp_path / "docs_stream_bl")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).format("parquet").load(src)
    gated = streaming_events.streaming_corpus_gate(
        stream, blocklist_terms=["Forbidden"]
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            gated.writeStream.format("memory").queryName("corpus_gate_bl")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
    ids = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM corpus_gate_bl").collect())
    assert ids == [0]  # the blocklisted doc never reaches the quality gate
    with pytest.raises(ValueError, match="literal blocklists"):
        streaming_events.streaming_corpus_gate(
            stream, blocklist_terms=[f"t{i}" for i in range(600)]
        )


def test_cli_top_tokens_verb(spark, sf_dir, tmp_path, capsys):
    """top-tokens CLI verb (r10): token mode equals the direct operator;
    --by-col/--weight-col ranks a column by weighted sum; misuse errors."""
    import json as _json

    from oaxaca_blinder_rs_spark.cli import main

    src = f"{sf_dir}/documents.parquet"
    assert main(["top-tokens", "--input", src, "--k", "5", "--capacity", "256"]) == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert len(rows) == 5 and rows[0]["n_exact"] >= rows[-1]["n_exact"]
    outj = str(tmp_path / "tt.json")
    assert main([
        "top-tokens", "--input", src, "--by-col", "source",
        "--weight-col", "n_chars", "--k", "3", "--output-json", outj,
    ]) == 0
    wrows = _json.load(open(outj))
    assert len(wrows) == 3 and wrows[0]["n_exact"] >= wrows[1]["n_exact"]
    with pytest.raises(SystemExit):
        main(["top-tokens", "--input", src, "--weight-col", "n_chars"])


def test_streaming_mg_to_batch_heavy_hitters_faces(spark, sf_dir, tmp_path):
    """r11: the streaming->batch bridge through the PUBLIC faces —
    streaming_mg_candidates (availableNow, two micro-batches so the sink
    accumulates MULTIPLE snapshots) -> mg_snapshot_candidates (union-of-keys
    superset + final per-bucket eviction totals) -> heavy_hitters_verify —
    equals the plain groupBy top-k exactly."""
    import tempfile

    from oaxaca_blinder_rs_spark.operators import sketches

    static = ob.load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_mg_faces")
    # two files => maxFilesPerTrigger=1 forces two micro-batches
    static.where(F.col("user_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    static.where(F.col("user_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    summ = streaming_events.streaming_mg_candidates(stream, "user_id", capacity=64, n_buckets=4)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            summ.writeStream.format("memory")
            .queryName("mg_faces")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
    snapshots = spark.table("mg_faces")
    cands, ub = streaming_events.mg_snapshot_candidates(snapshots)
    assert ub.collect()[0].u_bound == 0  # capacity 64 x 4 buckets > distinct keys
    got = [
        (r.key, r.n_exact)
        for r in sketches.heavy_hitters_verify(static, "user_id", cands, ub, k=7).collect()
    ]
    want = [
        (r.k, r.n)
        for r in static.select(F.col("user_id").cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("k"))
        .limit(7)
        .collect()
    ]
    assert got == want
    spark.catalog.dropTempView("mg_faces")


def test_cli_corpus_seq_len_mode(spark, sf_dir, tmp_path, capsys):
    """r12: --seq-len packs the kept documents into exact fixed-length
    training sequences (write_sequences sink); stats line reports sequence
    counts; --pack-budget/--shuffle-seed combinations are rejected."""
    import json as _json

    from oaxaca_blinder_rs_spark.cli import main

    src = f"{sf_dir}/documents.parquet"
    out = str(tmp_path / "seqs")
    assert main([
        "corpus", "--input", src, "--output", out,
        "--min-quality", "0.0", "--langs", "en,de,fr,es,zh,und",
        "--seq-len", "128", "--eos-token", "<|eos|>",
    ]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    back = spark.read.parquet(out)
    assert back.count() == stats["sequences"] > 0
    assert stats["full_sequences"] in (stats["sequences"], stats["sequences"] - 1)
    import pyspark.sql.functions as _F

    sizes = [r.n_tokens for r in back.orderBy("seq_id").collect()]
    assert all(n == 128 for n in sizes[:-1]) and 0 < sizes[-1] <= 128
    assert stats["total_tokens"] == sum(sizes)
    # the stream carries the eos boundary token
    assert back.filter(_F.col("text").contains("<|eos|>")).count() > 0

    assert main(["corpus", "--input", src, "--output", out,
                 "--seq-len", "8", "--pack-budget", "8"]) == 2
    assert "mutually exclusive" in capsys.readouterr().out
    assert main(["corpus", "--input", src, "--output", out,
                 "--seq-len", "8", "--shuffle-seed", "1"]) == 2
    assert "not supported" in capsys.readouterr().out
    # r13 advice: --eos-token without --seq-len is a rejected typo, not a
    # silent no-op that packs budget shards with no boundary token
    assert main(["corpus", "--input", src, "--output", out,
                 "--pack-budget", "64", "--eos-token", "<|eos|>"]) == 2
    assert "--eos-token requires --seq-len" in capsys.readouterr().out
    # r13 advice: misused invocations fail BEFORE any Spark action — a
    # nonexistent input path must still exit 2 on the argument error
    assert main(["corpus", "--input", str(tmp_path / "no_such.parquet"),
                 "--output", out, "--seq-len", "8", "--pack-budget", "8"]) == 2
    assert "mutually exclusive" in capsys.readouterr().out


def test_clip_stub_features_kernel(spark):
    """r13: the CLIP-stand-in embedding kernel is exact cross-engine — each
    component replays in DuckDB as sha256-hex arithmetic, values are 24-bit
    integer-valued doubles, and the mapInPandas plumbing carries it."""
    import duckdb
    import hashlib as _hl

    # pure-kernel law vs an independent reimplementation
    payload = "hello multimodal".encode()
    got = multimodal.clip_stub_features(payload, "image/fake", dim=8)
    for j, v in enumerate(got):
        h = _hl.sha256(payload + str(j).encode()).hexdigest()
        assert v == float(int(h[:6], 16) - (1 << 23))
        assert v == int(v) and abs(v) < 2 ** 23  # integer-valued, bounded
    # NULL payload convention matches coalesce(text, '')
    assert multimodal.clip_stub_features(None, "x", dim=2) == \
        multimodal.clip_stub_features(b"", "x", dim=2)
    # the DuckDB transliteration used by the clip_stub_central oracle
    dd = duckdb.sql(
        "SELECT (('0x' || substr(sha256('hello multimodal' || '3'), 1, 6))::BIGINT"
        " - 8388608)::DOUBLE AS v"
    ).fetchall()[0][0]
    assert dd == got[3]
    # the Arrow plumbing passes dim through for this kernel
    rows = [(i, f"doc {i}".encode(), "image/fake", None, None, None) for i in range(6)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(
        df, decode_fn=multimodal.clip_stub_features, dim=8
    ).collect()
    assert all(len(r["features"]) == 8 for r in feats)


def test_clip_stub_composes_with_semantic_dedup(spark):
    """r13: the CLIP-stub embedding feeds the EXISTING semantic-dedup face —
    identical payloads get identical embeddings (cosine 1.0) and are caught;
    hash-distinct payloads are kept. Kernel-agnostic pipeline: swap in a
    real CLIP encoder and nothing downstream changes."""
    from oaxaca_blinder_rs_spark.operators.embeddings import semantic_dedup

    rows = [(i, f"unique doc {i}".encode(), "image/fake", None, None, None)
            for i in range(10)]
    rows += [(100 + i, b"duplicated payload", "image/fake", None, None, None)
             for i in range(3)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    emb = multimodal.extract_features(
        df, decode_fn=multimodal.clip_stub_features, dim=8
    ).select(F.col("media_id").alias("vec_id"), F.col("features").alias("embedding"))
    out = {r["vec_id"]: r for r in semantic_dedup(emb, k=1, threshold=0.999).collect()}
    assert out[100]["keep"] and out[101]["dup_of"] == 100 and out[102]["dup_of"] == 100
    assert not out[101]["keep"] and not out[102]["keep"]
    assert all(out[i]["keep"] for i in range(10))


def test_cli_leakage_verb(spark, sf_dir, tmp_path, capsys):
    """r13: the leakage verb — split + audit in one command; summary JSON
    line, per-row JSON file, --fail-on-leak CI gate, validation errors."""
    import json as _json

    from oaxaca_blinder_rs_spark.cli import main

    src = f"{sf_dir}/documents.parquet"
    outj = str(tmp_path / "leaked.json")
    rc = main(["leakage", "--input", src, "--output-json", outj])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    stats = _json.loads(line)
    rows = _json.loads(open(outj).read())
    assert stats["leaked_docs"] == len(rows)
    assert rc == 0  # no gate requested
    if rows:  # sf0.001 plants leaks; every row names a train match + stage
        assert all(r["stage"] in ("exact", "near") and r["matched_train_id"] is not None
                   for r in rows)
        assert sum(stats["by_split_stage"].values()) == len(rows)
        # the CI gate trips when leaks exist
        assert main(["leakage", "--input", src, "--fail-on-leak"]) == 1
        capsys.readouterr()

    # existing split column path + validation
    assert main(["leakage", "--input", src, "--split-col", "nope"]) == 2
    assert "not found" in capsys.readouterr().out
    assert main(["leakage", "--input", src, "--fractions", "train=0.5,val=0.2"]) == 2
    assert "sum to 1" in capsys.readouterr().out
    assert main(["leakage", "--input", src, "--fractions", "garbage"]) == 2
    assert "bad --fractions" in capsys.readouterr().out


def test_cli_corpus_interleave_mode(spark, sf_dir, tmp_path, capsys):
    """r13: --interleave orders budget shards by the source-interleave so
    every shard holds the corpus mixture; mutual exclusions validate before
    any Spark action."""
    import json as _json

    from oaxaca_blinder_rs_spark.cli import main

    src = f"{sf_dir}/documents.parquet"
    out = str(tmp_path / "shards")
    assert main([
        "corpus", "--input", src, "--output", out,
        "--min-quality", "0.0", "--langs", "en,de,fr,es,zh,und",
        "--pack-budget", "2000", "--interleave",
    ]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["shards"] > 1
    back = spark.read.parquet(out)
    # interleaved packing: every full-size shard mixes sources — with 20
    # sources at uniform share, no shard is single-source
    per_shard = {
        r["shard_id"]: r["n"]
        for r in back.groupBy("shard_id").agg(
            F.countDistinct("source").alias("n")
        ).collect()
    }
    full = [s for s, n in per_shard.items() if n > 1]
    assert len(full) >= len(per_shard) - 1  # the remainder shard may be tiny

    assert main(["corpus", "--input", src, "--output", out,
                 "--interleave", "--shuffle-seed", "3"]) == 2
    assert "mutually exclusive" in capsys.readouterr().out
    assert main(["corpus", "--input", src, "--output", out,
                 "--interleave", "--seq-len", "8"]) == 2
    assert "not supported" in capsys.readouterr().out


def test_cli_interleave_keeps_null_group_rows(spark, sf_dir, tmp_path, capsys):
    """r14 (ADVICE): interleave_sources' count join is null-unsafe, so CLI
    --interleave silently dropped documents with a NULL --interleave-by
    value. The _interleave_keep_nulls wrapper coalesces into a temp
    sentinel column: nothing is dropped, NULL-group docs form their own
    evenly-spread source, and the user's column keeps its NULLs."""
    import json as _json

    from oaxaca_blinder_rs_spark.cli import _interleave_keep_nulls, main

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "source",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("source")),
    )
    n = docs.count()
    n_null = docs.filter(F.col("source").isNull()).count()
    assert n_null > 0

    # wrapper law: no rows lost, NULLs preserved, stream_pos a permutation
    out = _interleave_keep_nulls(docs, group_col="source", id_col="doc_id")
    assert out.count() == n
    assert out.filter(F.col("source").isNull()).count() == n_null
    assert "__interleave_grp" not in out.columns
    pos = out.agg(
        F.min("stream_pos").alias("lo"),
        F.max("stream_pos").alias("hi"),
        F.countDistinct("stream_pos").alias("d"),
    ).collect()[0]
    assert (pos.lo, pos.hi, pos.d) == (0, n - 1, n)

    # e2e: the packed output still carries the NULL-source docs
    src_dir = str(tmp_path / "docs_nullsrc")
    docs.write.parquet(src_dir)
    shards = str(tmp_path / "shards_nullsrc")
    assert main([
        "corpus", "--input", src_dir, "--output", shards,
        "--min-quality", "0.0", "--langs", "en,de,fr,es,zh,und",
        "--pack-budget", "2000", "--interleave",
    ]) == 0
    _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    back = spark.read.parquet(shards)
    assert back.filter(F.col("source").isNull()).count() > 0


def test_cli_ingest_verb(spark, tmp_path, capsys):
    """r14: the ingest verb — bootstrap a persisted dedup state with
    --init, then a day-1 ingest (exact dup + near dup dropped, fresh doc
    kept, state appended) and a day-2 ingest whose duplicate of the
    day-1 KEPT doc is caught against the appended state. Validation
    errors exit 2 before Spark work."""
    import json as _json

    from oaxaca_blinder_rs_spark.cli import main

    base = " ".join(f"tok{i}" for i in range(60))
    corpus_dir = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, base), (2, "existing corpus doc about watermark recovery")],
        "doc_id long, text string",
    ).write.parquet(corpus_dir)
    state = str(tmp_path / "state")

    assert main(["ingest", "--init", "--batch", corpus_dir, "--state", state]) == 0
    st = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st == {"state_rows": 2}

    b1_dir = str(tmp_path / "b1")
    spark.createDataFrame(
        [(10, base), (11, base + " extraword"), (12, "a fresh day one doc about banded joins")],
        "doc_id long, text string",
    ).write.parquet(b1_dir)
    out1, dropped1 = str(tmp_path / "kept1"), str(tmp_path / "dropped1.json")
    assert main(["ingest", "--batch", b1_dir, "--state", state,
                 "--output", out1, "--output-json", dropped1]) == 0
    st1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st1 == {"batch_docs": 3, "dropped_exact": 1, "dropped_near": 1,
                   "docs_kept": 1, "state_rows_appended": 1}
    rows = _json.loads(open(dropped1).read())
    assert {(r["doc_id"], r["matched_ref_id"], r["stage"]) for r in rows} == \
        {(10, 1, "exact"), (11, 1, "near")}
    assert {r["doc_id"] for r in spark.read.parquet(out1).collect()} == {12}

    # day 2: a dup of the day-1 KEPT doc is caught via the appended state
    b2_dir = str(tmp_path / "b2")
    spark.createDataFrame(
        [(20, "a fresh day one doc about banded joins"), (21, "another brand new doc")],
        "doc_id long, text string",
    ).write.parquet(b2_dir)
    out2 = str(tmp_path / "kept2")
    assert main(["ingest", "--batch", b2_dir, "--state", state, "--output", out2]) == 0
    st2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st2["dropped_exact"] == 1 and st2["docs_kept"] == 1
    assert {r["doc_id"] for r in spark.read.parquet(out2).collect()} == {21}

    # dry-run leaves the state untouched
    n_state = spark.read.parquet(state).count()
    out3 = str(tmp_path / "kept3")
    assert main(["ingest", "--batch", b2_dir, "--state", state,
                 "--output", out3, "--no-update-state"]) == 0
    capsys.readouterr()
    assert spark.read.parquet(state).count() == n_state

    # validation before Spark work
    assert main(["ingest", "--batch", b2_dir, "--state", state]) == 2
    assert "--output is required" in capsys.readouterr().out
    assert main(["ingest", "--batch", b2_dir, "--state", str(tmp_path / "nope"),
                 "--output", out3]) == 2
    assert "bootstrap it with --init" in capsys.readouterr().out
    assert main(["ingest", "--init", "--batch", b2_dir, "--state", state,
                 "--output", out3]) == 2
    assert "only builds the state" in capsys.readouterr().out


def test_cli_leakage_summary_without_output_json(spark, sf_dir, capsys, tmp_path):
    """r14 (ADVICE): without --output-json the leakage verb now counts via
    a groupBy aggregation (no unbounded driver collect); the summary must
    agree with the full-dump path's row-derived counts."""
    import json as _json

    from oaxaca_blinder_rs_spark.cli import main

    src = f"{sf_dir}/documents.parquet"
    assert main(["leakage", "--input", src]) == 0
    agg_stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    outj = str(tmp_path / "leaked.json")
    assert main(["leakage", "--input", src, "--output-json", outj]) == 0
    dump_stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert agg_stats["leaked_docs"] == dump_stats["leaked_docs"]
    assert agg_stats["by_split_stage"] == dump_stats["by_split_stage"]
    assert agg_stats["leaked_docs"] == sum(agg_stats["by_split_stage"].values())
