"""End-to-end LLM training-corpus curation on the extension tier (no
reference analog — the north-star surface, SURVEY.md §2.11): deterministic
subsample -> language/quality gate -> repetition filter -> PII scrub ->
corpus-level span dedup -> unigram-LM perplexity gate -> exact dedup ->
minhash near-dup clustering -> canonical-document selection -> benchmark
decontamination -> per-source cap -> temperature rebalancing ->
token-window chunking -> training-bin packing -> epoch shuffle/shard
assignment -> per-class embedding centroids -> BM25 + IVF-PQ retrieval
over the curated corpus -> embedding-side curation and audits (SemDeDup,
semantic decontamination, DSIR data selection, nearest-centroid label
audit, chi-squared class vocabulary).

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
from census_data_pipeline_spark.functions import decontam, dedup, sampling, text
from census_data_pipeline_spark.sources.catalog import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(sf_dir: str = SF_DIR) -> int:
    spark = get_spark(app_name="llm_corpus_pipeline")

    docs = load_table(spark, sf_dir, "documents")
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

    # 2a. repetition gate (Gopher-style): drop template/boilerplate pages
    rep = text.repetition_stats(kept).filter(
        (F.col("top_gram_frac") <= 0.06) & (F.col("dup_gram_frac") <= 0.01)
    )
    kept = kept.join(rep.select("doc_id"), "doc_id")

    # 2b. PII redaction before anything is persisted (counts + scrub in
    #     one narrow pass)
    kept = text.scrub_pii(kept, "text")

    # 2c. corpus-level span dedup (r4): strip cross-document boilerplate
    #     spans BEFORE pairwise near-dup — duplication collapses work
    #     here instead of exploding LSH buckets (SCALING.md)
    respanned = dedup.span_dedup(kept, "text", "doc_id", span_tokens=16)
    kept = (
        kept.drop("text")
        .join(respanned.filter(F.col("n_kept") > 0)
              .select("doc_id", F.col("text_dedup").alias("text")),
              "doc_id")
    )

    # 2d. unigram-LM quality gate (r4): CCNet-style perplexity proxy —
    #     drop documents whose token distribution is far from the
    #     corpus model
    lm = text.unigram_logprob(kept, "text", "doc_id")
    kept = kept.join(
        lm.filter(F.col("ppl_proxy") <= 40.0).select("doc_id"), "doc_id"
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

    # 4b. benchmark decontamination: hold out doc_id % 97 == 0 as the
    #     stand-in eval set; drop training docs sharing any 3-gram
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    survivors = docs.join(canonical.select("doc_id"), "doc_id").filter(
        F.col("doc_id") % 97 != 0
    )
    clean = decontam.decontaminate(survivors, ev, n=3)
    print(f"after decontamination : {clean.count()}")

    # 5. source balancing + training-sample prep: cap docs per source,
    #    temperature-rebalance (alpha=0.5) toward rare sources, chunk into
    #    token windows, pack into fixed-budget bins
    balanced = sampling.cap_per_group(clean, ["source"], cap=40)
    balanced = sampling.temperature_sample(balanced, "doc_id", "source")
    chunks = text.chunk_texts(balanced, chunk_size=64, stride=48)
    sized = balanced.select(
        "doc_id", "source", text.token_count("text").alias("n_tokens")
    )
    bins = text.pack_token_bins(sized, budget=256)
    n_bins = bins.select("source", "bin_id").distinct().count()
    print(f"after cap+temperature : {balanced.count()}")
    print(f"training chunks       : {chunks.count()}")
    print(f"packed training bins  : {n_bins}")

    # 5b. rare-language upweighting (integer replication, RNG-free) and
    #     deterministic train/val/test split — both by-key and exhaustive
    upsampled = sampling.upsample_by_weight(balanced, "lang", {"fr": 3, "de": 2})
    split = sampling.hash_split(
        balanced, "doc_id", [("train", 245), ("val", 8), ("test", 3)]
    )
    split_counts = {r.split: r.n for r in split.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    print(f"after rare upweight   : {upsampled.count()}")
    print(f"split assignment      : {split_counts}")

    # 5c. deterministic epoch shuffle: global order + shard assignment
    #     via the two-phase prefix-sum rank (no single-partition window)
    shards = sampling.epoch_shuffle_shards(balanced, "doc_id", seed=0, shard_size=32)
    n_shards = shards.select("shard").distinct().count()
    print(f"epoch-0 shards        : {n_shards}")

    # 6. per-class embedding centroids for the survivors' vector table
    emb = load_table(spark, sf_dir, "embeddings")
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

    # 7. retrieval over the curated corpus (r4): BM25 keyword top-5 and
    #    IVF-PQ approximate vector neighbors for a sample of queries
    from census_data_pipeline_spark.functions import search, similarity

    corpus_text = canonical.select("doc_id").join(
        kept.select("doc_id", "text"), "doc_id"
    )
    hits = search.bm25_topk(corpus_text, ["vector", "stream"], k=5)
    print("\nBM25 top-5 for 'vector stream':")
    for r in hits.collect():
        print(f"  doc {r.doc_id}: score={r.score} matched={r.n_matched}")
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    ann = similarity.knn_ivfpq_seeded(
        emb, queries, k=3, n_centroids=16, n_probes=6,
        m=8, n_codes=16, dim=64, rerank=50,
    )
    print(f"IVF-PQ neighbor rows  : {ann.count()}")

    # 8. embedding-side curation + audits (r4): SemDeDup, semantic
    #    decontamination, DSIR data selection, nearest-centroid label
    #    audit, and the chi-squared per-class vocabulary report
    sem = similarity.semantic_dedup(emb, threshold=0.3, n_centroids=16)
    n_sem_kept = sem.filter("kept").count()
    print(f"\nSemDeDup survivors    : {n_sem_kept} / {sem.count()}")

    ev_vec = emb.filter(F.col("vec_id") % 97 == 0)
    tr_vec = emb.filter(F.col("vec_id") % 97 != 0)
    sem_flagged = decontam.semantic_contamination(
        tr_vec, ev_vec, threshold=0.3
    )
    print(f"semantic-decontam flags: {sem_flagged.count()}")

    dsir = text.dsir_logratio(
        docs, target=F.col("source").isin("src0", "src1")
    )
    n_sel = dsir.filter(F.col("logratio") > 0).count()
    print(f"DSIR-positive docs    : {n_sel}")

    audit = similarity.classify_nearest_centroid(emb)
    acc = audit.agg(F.avg(F.col("correct").cast("double"))).first()[0]
    print(f"centroid label audit  : accuracy={acc:.3f}")

    chi = text.chi2_feature_selection(docs, "source", top_k=2)
    print("top chi2 tokens (first 2 classes):")
    for r in sorted(chi.collect(), key=lambda r: (r["class"], r.rank))[:4]:
        print(f"  {r['class']}: #{r.rank} {r.token} (chi2={r.chi2})")

    # 9. r5 stages — mix assembly, tokenizer training, hybrid retrieval,
    #    clustering: fill a per-source token budget over the curated
    #    docs, train a BPE vocabulary and measure its compression, fuse
    #    BM25 + vector ranks with RRF, mine hard negatives, and cluster
    #    the embedding space with the SQL-replicated Lloyd trainer
    mix = sampling.token_budget_sample(
        docs.join(canonical.select("doc_id"), "doc_id"),
        budget_tokens=400,
    )
    print(f"\ntoken-budget mix rows : {mix.count()}")

    merges = text.bpe_train(docs, num_merges=6)
    print("BPE merge table:")
    for r in merges.orderBy("step").collect():
        print(f"  step {r.step}: '{r.lhs}'+'{r.rhs}' -> '{r.merged}' "
              f"(weight {r.weight})")
    seg = text.bpe_segment(docs, num_merges=6)
    cpt = seg.agg(F.round(F.avg("chars_per_token"), 4)).first()[0]
    print(f"mean chars/BPE token  : {cpt}")

    sem_hits = similarity.knn_bruteforce(
        emb, emb.filter(F.col("vec_id") == 0), k=25
    ).withColumnRenamed("neighbor_id", "doc_id")
    from pyspark.sql import Window
    lex = search.bm25_topk(corpus_text, ["vector", "stream"], k=25)
    lex = lex.withColumn(
        "rank", F.row_number().over(
            Window.orderBy(F.col("score").desc(), "doc_id"))
    )
    fused = search.rrf_fuse([lex, sem_hits], rrf_k=60, k=5)
    print("hybrid RRF top-5:")
    for r in fused.collect():
        print(f"  doc {r.doc_id}: rrf={r.rrf_score} "
              f"retrievers={r.n_retrievers}")

    negs = similarity.hard_negatives(
        emb, emb.filter(F.col("vec_id") % 500 == 0), k=3
    )
    print(f"hard negatives mined  : {negs.count()}")

    sil = similarity.silhouette_simplified(emb, k=8, iterations=2)
    print("Lloyd k=8 silhouette by cell:")
    for r in sil.orderBy("cell").collect():
        print(f"  cell {r.cell}: n={r.n} s={r.mean_silhouette}")

    # NOTE: no spark.stop() — the session is shared when driven from tests
    return n_final


if __name__ == "__main__":
    main()
