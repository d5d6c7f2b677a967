"""Tests for the raw-text sources (one-doc-per-line and one-doc-per-file)."""

import os

from oaxaca_blinder_rs_spark.sources.text import read_text_files, read_text_lines


def test_read_text_lines_row_ids_and_blanks(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("first doc\nsecond doc\n\n   \nthird doc\n", encoding="utf-8")
    df = read_text_lines(spark, str(p))
    rows = sorted(df.collect(), key=lambda r: r["__row_id__"] if "__row_id__" in r else r[df.columns[-1]])
    texts = [r["text"] for r in rows]
    assert texts == ["first doc", "second doc", "third doc"]
    id_col = [c for c in df.columns if c != "text"][0]
    assert sorted(r[id_col] for r in rows) == [0, 1, 2]


def test_read_text_lines_keep_blanks(spark, tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("a\n\nb\n", encoding="utf-8")
    df = read_text_lines(spark, str(p), drop_blank=False, with_row_id=False)
    assert df.count() == 3


def test_read_text_files_whole_documents(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.txt").write_text("alpha body\nwith two lines", encoding="utf-8")
    (d / "b.txt").write_text("beta body", encoding="utf-8")
    df = read_text_files(spark, str(d), with_row_id=False)
    rows = {os.path.basename(r["source_path"]): r["text"] for r in df.collect()}
    assert rows["a.txt"] == "alpha body\nwith two lines"
    assert rows["b.txt"] == "beta body"


def test_text_lines_feed_the_filter_ops(spark, tmp_path):
    # ingest composes with the corpus filters: tokenize + quality on raw text
    from pyspark.sql import functions as F

    from oaxaca_blinder_rs_spark.operators import textops

    p = tmp_path / "c.txt"
    p.write_text("the quick brown fox\nanother short line\n", encoding="utf-8")
    df = read_text_lines(spark, str(p), with_row_id=False)
    out = df.select(textops.token_count(F.col("text")).alias("n")).collect()
    assert sorted(r["n"] for r in out) == [3, 4]
