"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set (LLM-data-pipeline tier,
SURVEY.md §2.11 ⊕; not in the reference — standard practice for any
corpus that feeds model training, per GPT-3 appendix C / PaLM §6).

Scale shape: the benchmark side is tiny relative to the corpus (thousands
of eval documents vs billions of training documents), so its distinct
n-gram set is collected into a broadcast hash relation; the training side
is one narrow explode + broadcast semi-join + per-doc count — a single
shuffle on ``id_col`` whose volume is only the *matching* grams, not the
corpus. No all-pairs stage, no driver-side materialization.

Real pipelines use 8–13-token grams; the synthetic test corpus has 10–99
token docs over a tiny vocabulary, so queries use n=3 to exercise the
same plan with a non-degenerate match rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from census_data_pipeline_spark.functions import text


def eval_gram_set(eval_df: DataFrame, text_col: str = "text", n: int = 13) -> DataFrame:
    """Distinct word n-grams of the benchmark set — the broadcast side.
    Uses ``shingles`` (deduplicated) since membership is all that matters."""
    return (
        eval_df.select(F.explode(text.shingles(text_col, n)).alias("gram"))
        .distinct()
    )


def ngram_overlap_contamination(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Per-training-document count of distinct n-grams shared with the
    eval set. Returns only contaminated docs (``id_col``, ``n_overlap``) —
    the downstream action is an anti-join to drop them, so the result is
    deliberately the small side of that join."""
    grams = eval_gram_set(eval_df, text_col, n)
    train_grams = train_df.select(
        F.col(id_col), F.explode(text.shingles(text_col, n)).alias("gram")
    )
    return (
        train_grams.join(F.broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    max_overlap: int = 0,
) -> DataFrame:
    """Drop training docs sharing more than ``max_overlap`` n-grams with
    the eval set: contamination count + left_anti on the flagged ids."""
    flagged = ngram_overlap_contamination(
        train_df, eval_df, text_col, id_col, n
    ).filter(F.col("n_overlap") > max_overlap)
    return train_df.join(flagged.select(id_col), id_col, "left_anti")


def semantic_contamination(
    train_df: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level decontamination: training vectors whose cosine to
    ANY eval vector reaches ``threshold`` — the paraphrase-robust
    complement of n-gram overlap (a reworded benchmark item shares no
    13-gram but sits next to the original in embedding space; this is
    the screen modern pipelines run alongside the lexical one).

    Returns flagged (``id_col``, ``max_eval_cosine``) — like
    ``ngram_overlap_contamination``, deliberately the small side of the
    downstream anti-join.

    Scale shape mirrors the lexical path exactly: the EVAL side is the
    small one, so it broadcasts (as vectors, not grams) and the corpus
    is scanned once with a per-row max over the broadcast side — no
    corpus shuffle except the final groupBy(id) which AQE coalesces.
    For very large eval sets compose with the LSH/IVF candidates
    instead (``similarity.knn_lsh``) — same verify expression."""
    from census_data_pipeline_spark.functions.similarity import (
        _as_double,
        _cos_precomputed,
        dot,
    )

    ev = eval_df.select(
        F.col(id_col).alias("__eid"),
        _as_double(F.col(vec_col)).alias("__ev"),
    ).withColumn("__en", F.sqrt(dot(F.col("__ev"), F.col("__ev"))))
    tr = train_df.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("__tv"),
    ).withColumn("__tn", F.sqrt(dot(F.col("__tv"), F.col("__tv"))))
    scored = tr.crossJoin(F.broadcast(ev)).withColumn(
        "__cos",
        _cos_precomputed(F.col("__tv"), F.col("__ev"),
                         F.col("__tn"), F.col("__en")),
    )
    return (
        scored.groupBy(id_col)
        .agg(F.max("__cos").alias("max_eval_cosine"))
        .filter(F.col("max_eval_cosine") >= threshold)
    )


def decontaminate_semantic(
    train_df: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Drop training vectors semantically too close to the eval set."""
    flagged = semantic_contamination(
        train_df, eval_df, threshold, id_col, vec_col
    )
    return train_df.join(flagged.select(id_col), id_col, "left_anti")
