"""Composite corpus-preparation pipeline (net-new scale surface).

The standard LLM training-data flow, composed from this package's verified
stages: quality/language gating (textops) -> exact dedup on a canonical
prefix fingerprint (keep the lowest id per group) -> near-dup clustering
(n-gram Jaccard edges -> connected components, dedup.dup_clusters) ->
cluster representatives survive. One call takes a raw documents frame to a
train-ready keep-list with its quality metadata.

Scale notes: the near-dup edge set defaults to size-pruned all-pairs —
right for contract-scale verification; at corpus scale pass
``candidate_pairs`` built from ``dedup.minhash_lsh_candidates`` (banded
shuffle) so no all-pairs join ever runs. Every stage is a shuffle on a
bounded key (hash, bucket, node id); nothing funnels through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, textops

__all__ = ["prepare_corpus"]


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.9,
    shingle_k: int = 3,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Raw documents -> (doc_id, n_tokens, quality, lang) keep-list.

    Stages: (1) keep docs with quality_score >= min_quality and a language
    guess in ``langs``; (2) exact dedup on the 5-token-prefix md5, keeping
    the lowest doc id per group; (3) near-dup clustering at
    ``jaccard_threshold`` over ``shingle_k``-gram shingles (edges from
    ``candidate_pairs`` when given, else size-pruned all-pairs), keeping
    each cluster's lowest-id representative.
    """
    t = F.col("__text")
    scored = docs.select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        textops.token_count(F.col(text_col)).alias("n_tokens"),
        F.round(textops.quality_score(F.col(text_col)), 6).alias("quality"),
        textops.lang_id(F.col(text_col)).alias("lang"),
    )
    kept = scored.filter(
        (F.col("quality") >= float(min_quality)) & F.col("lang").isin(list(langs))
    )

    # exact dedup: canonical 5-token-prefix fingerprint, keep min id
    toks = F.split(F.trim(F.lower(t)), r"\s+")
    kept = kept.withColumn("__fp", F.md5(F.concat_ws(" ", F.slice(toks, 1, 5))))
    reps = kept.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    kept = kept.join(reps, ["__fp", id_col]).drop("__fp")

    # near-dup clustering among survivors
    if candidate_pairs is None:
        candidate_pairs = dedup.size_pruned_pairs(
            kept, text_col="__text", id_col=id_col, k=shingle_k, threshold=jaccard_threshold
        )
    edges = dedup.ngram_jaccard(
        kept, candidate_pairs, text_col="__text", id_col=id_col, k=shingle_k
    ).filter(F.round("jaccard", 6) >= float(jaccard_threshold))
    clusters = dedup.dup_clusters(edges.select("id_a", "id_b"))
    dropped = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    survivors = kept.join(dropped, id_col, "left_anti")
    return survivors.select(id_col, "n_tokens", "quality", "lang")
