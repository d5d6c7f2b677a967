"""Size-targeted parquet sink.

At cluster scale the output side has its own failure mode: a shuffle with
thousands of tasks writes thousands of tiny files (metadata pressure,
slow scans), while one task writes one huge file (no read parallelism).
``write_sized_parquet`` measures the actual compressed bytes-per-row on a
sample — written through the same parquet codec, not guessed from the
schema — and repartitions to hit a target file size before writing.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_sized_parquet", "write_token_shards", "write_sequences"]


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_file_mb: float = 256.0,
    partition_by: list[str] | None = None,
    sample_rows: int = 1000,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as parquet with files sized near ``target_file_mb``.

    A ``sample_rows``-row head is written to a sibling scratch directory to
    measure real compressed bytes-per-row; the frame is then repartitioned
    to ``ceil(total_bytes / target)`` files (per partition_by value when
    partitioning). Returns {rows, files, bytes_per_row} for observability.
    Estimation costs one small write + one count — negligible against the
    main write at any scale worth sizing.
    """
    n = df.count()
    if n == 0:
        df.write.mode(mode).parquet(path)
        return {"rows": 0, "files": 0, "bytes_per_row": 0.0}

    scratch = os.path.join(
        os.path.dirname(path.rstrip("/")) or ".", f"__sizing_{uuid.uuid4().hex}"
    )
    sample_n = min(int(sample_rows), n)
    df.limit(sample_n).coalesce(1).write.mode("overwrite").parquet(scratch)
    try:
        sample_bytes = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(scratch)
            for f in files
            if f.endswith(".parquet")
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    bytes_per_row = max(sample_bytes / sample_n, 1.0)

    target_bytes = float(target_file_mb) * 1024 * 1024
    files = max(1, math.ceil(n * bytes_per_row / target_bytes))
    writer = df.repartition(files, *partition_by) if partition_by else df.repartition(files)
    out = writer.write.mode(mode)
    if partition_by:
        out = out.partitionBy(*partition_by)
    out.parquet(path)
    return {"rows": n, "files": files, "bytes_per_row": bytes_per_row}


def write_token_shards(
    docs: DataFrame,
    path: str,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    mode: str = "overwrite",
    order_cols: list[str] | None = None,
) -> dict:
    """Write a corpus as token-budget training shards: hive-partitioned
    parquet under ``path/shard_id=N/`` with each document carrying its
    ``n_tokens`` and global ``token_offset``.

    The last mile of the corpus pipeline (gate -> dedup -> pack -> shard):
    shard assignment comes from ``corpus.pack_token_shards`` (distributed
    prefix scan), the write shuffles once on shard_id, and a data loader
    can stream shard directories independently with stable offsets.
    A shard holds every document whose first token falls in its window, so
    a shard's token sum can overrun ``budget`` by at most one document.
    ``order_cols`` passes through to the packer (e.g. ["shuffle_key"] for
    the shuffle-then-pack pipeline). Returns {rows, shards, total_tokens}.
    """
    from ..operators.corpus import pack_token_shards

    packed = pack_token_shards(
        docs, budget, text_col=text_col, id_col=id_col, token_col=token_col,
        order_cols=order_cols,
    )
    # the packed frame re-emits these; drop caller-side copies (e.g. a
    # precomputed token count passed via token_col) so the join is clean
    overlap = [c for c in ("n_tokens", "token_offset", "shard_id") if c in docs.columns]
    joined = docs.drop(*overlap).join(packed, id_col)
    joined.repartition("shard_id").write.mode(mode).partitionBy("shard_id").parquet(path)
    stats = packed.agg(
        {"*": "count", "shard_id": "max", "n_tokens": "sum"}
    ).collect()[0]
    return {
        "rows": int(stats["count(1)"]),
        "shards": int(stats["max(shard_id)"]) + 1 if stats["max(shard_id)"] is not None else 0,
        "total_tokens": int(stats["sum(n_tokens)"] or 0),
    }


def write_sequences(
    docs: DataFrame,
    path: str,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    eos_token: str | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write a corpus as packed fixed-length training sequences: parquet
    files range-partitioned on ``seq_id`` so each file holds a contiguous,
    sorted run of sequences a loader can stream in stream order without a
    global sort at read time.

    The concat-and-chunk last mile (``corpus.pack_sequences``): documents
    split across sequence boundaries, every sequence holds exactly
    ``seq_len`` tokens except the final remainder. Returns
    {sequences, full_sequences, total_tokens} for observability.

    Re-tokenization caveat (consumer-facing): ``n_tokens`` counts tokens
    under the corpus convention where a NULL/empty document contributes ONE
    empty token. A sequence whose window covers such a document (or text
    with leading/doubled whitespace) re-tokenizes under ``\\s+`` to FEWER
    than ``n_tokens`` — loaders must trust the ``n_tokens`` column, not
    re-split ``text``. Pass ``eos_token`` to make every document contribute
    at least one non-empty token and keep the gap to boundary effects only.
    """
    from ..operators.corpus import pack_sequences

    seqs = pack_sequences(
        docs, seq_len, text_col=text_col, id_col=id_col, eos_token=eos_token
    )
    nparts = max(docs.sparkSession.sparkContext.defaultParallelism, 1)
    seqs = seqs.repartitionByRange(nparts, "seq_id").sortWithinPartitions("seq_id")
    seqs.write.mode(mode).parquet(path)
    out = docs.sparkSession.read.parquet(path)
    stats = out.agg(
        F.count("seq_id").alias("sequences"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(
            F.when(F.col("n_tokens") == int(seq_len), F.lit(1)).otherwise(F.lit(0))
        ).alias("full_sequences"),
    ).collect()[0]
    return {
        "sequences": int(stats["sequences"] or 0),
        "full_sequences": int(stats["full_sequences"] or 0),
        "total_tokens": int(stats["total_tokens"] or 0),
    }
