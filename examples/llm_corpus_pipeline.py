"""End-to-end LLM training-corpus curation on the extension tier (no
reference analog — the north-star surface, SURVEY.md §2.11): deterministic
subsample -> language/quality gate -> exact dedup -> minhash near-dup
clustering -> canonical-document selection -> per-class embedding
centroids.

Every stage is the same operator the driver contract exercises
(functions/{sampling,text,dedup,similarity}.py); chained here the whole
job is a handful of hash shuffles on compact keys — the shape it keeps at
100 TB (see SCALING.md)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from census_data_pipeline_spark import get_spark
from census_data_pipeline_spark.functions import dedup, sampling, text
from census_data_pipeline_spark.sources.catalog import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="llm_corpus_pipeline")

    docs = load_table(spark, SF_DIR, "documents")
    total = docs.count()

    # 1. deterministic ~50% subsample (monotone: rerunning at a higher
    #    fraction strictly extends this corpus)
    sampled = sampling.hash_sample(docs, "doc_id", 128)

    # 2. language + quality gate (pure Catalyst expressions)
    scored = sampled.select(
        "doc_id", "text",
        text.lang_id("text").alias("lang_pred"),
        text.quality_score("text").alias("quality"),
    )
    kept = scored.filter(
        (F.col("lang_pred") == "en") & (F.col("quality") >= 0.5)
    )

    # 3. exact dedup (one shuffle on a 16-byte content hash)
    uniq = dedup.exact_dedup(kept, "text", "doc_id")

    # 4. near-dup pairs (minhash LSH) -> connected components -> keep the
    #    minimum doc id of every cluster
    pairs = dedup.minhash_lsh_pairs(kept, num_hashes=8, band_size=2, n=3,
                                    threshold=0.5)
    clusters = dedup.dup_clusters(pairs)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    canonical = uniq.join(drop, "doc_id", "left_anti")

    n_kept, n_uniq, n_pairs, n_final = (
        kept.count(), uniq.count(), pairs.count(), canonical.count(),
    )
    print(f"documents             : {total}")
    print(f"after 50% hash sample : {sampled.count()}")
    print(f"after lang+quality    : {n_kept}")
    print(f"after exact dedup     : {n_uniq}")
    print(f"near-dup pairs found  : {n_pairs}")
    print(f"final canonical corpus: {n_final}")

    # 5. per-class embedding centroids for the survivors' vector table
    emb = load_table(spark, SF_DIR, "embeddings")
    centroids = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(F.count("*").alias("dim"), F.round(F.avg("m"), 6).alias("mean_of_means"))
        .orderBy("label")
    )
    print("\nembedding centroids (label, dim, mean-of-means):")
    for r in centroids.collect():
        print(f"  label {r.label}: dim={r.dim} mean={r.mean_of_means}")

    spark.stop()


if __name__ == "__main__":
    main()
