#!/usr/bin/env python
"""End-to-end training-data pipeline over the synthetic corpus — the
composition a user of this engine actually runs, every stage an
oracle-checked operator from the catalog:

    load → curate (quality/lang/exact-dup verdicts)
         → hygiene gates (encoding damage + word blocklist)
         → near-dup pairs (MinHash LSH) → connected components (two-star)
           keep one doc per duplicate cluster
         → decontaminate vs an eval set (broadcast Bloom pre-prune)
         → domain mixture sampling under a token budget
         → leakage-safe train/val/test split (group-coherent hash)
         → FFD bin packing + shard assignment → shard writer
         → deflate-ratio repetitiveness audit of the shipped set
         → IVF index over the embeddings table + a search probe

Usage::

    python examples/train_data_pipeline.py [sf_dir] [out_dir]

Prints one JSON line of per-stage counts (the smoke test asserts the
funnel shape).  Defaults: sf0.001 and a temp dir.
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mcpvectordb_spark.io import load_table  # noqa: E402
from mcpvectordb_spark.operators import curation as cu  # noqa: E402
from mcpvectordb_spark.operators import dedup as dd  # noqa: E402
from mcpvectordb_spark.operators.knn import IvfIndex  # noqa: E402
from mcpvectordb_spark.operators.textstats import ws_token_count  # noqa: E402
from mcpvectordb_spark.pipeline import curate_corpus  # noqa: E402
from mcpvectordb_spark.session import get_spark  # noqa: E402


def main(sf_dir: str, out_dir: str) -> dict:
    spark = get_spark("train-data-pipeline")
    counts: dict[str, int] = {}

    docs = load_table(spark, sf_dir, "documents")
    counts["loaded"] = docs.count()

    # 1. per-doc curation verdicts (quality / language / exact-dup gates)
    curated = curate_corpus(docs, "doc_id", "text", min_quality=0.3, min_words=5)
    kept = curated.filter(F.col("drop_reason").isNull())
    counts["after_curation"] = kept.count()

    # 2. near-dup removal: LSH candidates → exact Jaccard → two-star CC,
    #    keep the canonical (minimum-id) doc of every duplicate cluster
    pairs = dd.minhash_lsh_pairs(kept, "doc_id", "text", threshold=0.5)
    clusters = dd.dedup_clusters_twostar(kept.select(F.col("doc_id")), pairs, "doc_id")
    kept = kept.join(clusters, "doc_id").filter(
        F.col("cluster_id") == F.col("doc_id")
    ).drop("cluster_id")
    counts["after_neardup"] = kept.count()

    # 2b. web-style hygiene gates: encoding damage + word blocklist —
    #     both map-only codegen, so they fuse into the same corpus scan
    from mcpvectordb_spark.operators.textstats import encoding_artifacts

    damaged = encoding_artifacts(
        kept.select(F.col("doc_id").alias("id"), "text"), "id", "text"
    ).filter("damaged").select(F.col("id").alias("doc_id"))
    blocked = cu.blocklist_flags(
        kept.select(F.col("doc_id").alias("id"), "text"), "id", "text",
        ["casino", "lottery", "jackpot"],
    ).filter("blocked").select(F.col("id").alias("doc_id"))
    kept = kept.join(damaged.unionByName(blocked).distinct(), "doc_id", "left_anti")
    counts["after_hygiene"] = kept.count()

    # 2c. PII scrub: emails/phones redacted, card-number candidates
    #     Luhn-validated and only real cards replaced — all map-only
    #     codegen, fused into the scan
    scrubbed = cu.scrub_pii(kept, "text")
    scrubbed = cu.scrub_cards(
        scrubbed.withColumn("text", F.col("clean_text")).drop("clean_text"), "text"
    )
    counts["pii_docs_scrubbed"] = scrubbed.filter(
        (F.col("n_emails") > 0) | (F.col("n_phones") > 0) | (F.col("n_cards_valid") > 0)
    ).count()
    kept = scrubbed.withColumn("text", F.col("card_clean_text")).drop(
        "n_emails", "n_phones",
        "n_card_candidates", "n_cards_valid", "card_clean_text",
    )

    # 3. decontamination against an eval set (here: a held-out slice),
    #    Bloom pre-prune + exact shingle-overlap verification
    eval_set = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("id"), "text"
    )
    report = cu.decontaminate(
        kept.select(F.col("doc_id").alias("id"), "text"), eval_set, "id", "text",
        n=3, threshold=0.5, bloom_bits=1 << 18, bloom_k=3,
    )
    contaminated = report.filter(F.col("matched_evals") > 0).select(
        F.col("id").alias("doc_id")
    )
    kept = kept.join(contaminated, "doc_id", "left_anti")
    counts["after_decontamination"] = kept.count()

    # 4. domain mixture under a token budget (sources re-weighted, basis
    #    points as in mixture_rates — integer-exact, engine-portable)
    weighted = kept.withColumn("n_tokens", ws_token_count(F.col("text")))
    domains = sorted(r["source"] for r in weighted.select("source").distinct().collect())
    weights_bp = {
        d: (2 if i % 2 == 0 else 1) * 10000 // max(len(domains), 1)
        for i, d in enumerate(domains)
    }
    total_tokens = int(weighted.agg(F.sum("n_tokens")).first()[0])
    sampled = cu.mixture_sample(
        weighted, "doc_id", "source", "n_tokens", weights_bp,
        budget_tokens=int(total_tokens * 0.6),
    )
    counts["after_mixture"] = sampled.count()

    # 4b. leakage-safe split: whole domains stay on one side of the
    #     train/eval boundary (group-coherent hash assignment)
    sampled = cu.assign_split(sampled, "source", val_bp=1000, test_bp=1000)
    counts["train_docs"] = sampled.filter("split = 'train'").count()
    sampled = sampled.filter("split = 'train'").drop("split")

    # 5. pack whole docs into 512-token bins, then write ordered shards
    packed = cu.pack_bins_ffd(sampled, "doc_id", F.col("n_tokens"), 512, 4)
    counts["bins"] = packed.select("shard", "bin_id").distinct().count()
    cu.write_shards(sampled.select("doc_id", "text", "n_tokens"),
                    out_dir + "/shards", "doc_id", 4)
    counts["sharded_docs"] = spark.read.parquet(out_dir + "/shards").count()

    # 5b. audit what shipped: deflate-ratio repetitiveness profile of the
    #     final training set (Arrow kernel — whole-doc repetition signal)
    from mcpvectordb_spark.operators.textstats import deflate_ratio

    counts["repetitive_shipped"] = (
        deflate_ratio(sampled.select(F.col("doc_id").alias("id"), "text"), "id", "text")
        .filter("deflate_ratio < 0.3").count()
    )

    # 6. ANN serving path: persisted IVF index + a probe query
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    centroids = emb.orderBy("id").limit(8).select(
        F.col("id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    idx = IvfIndex.build(spark, emb, centroids, out_dir + "/ivf", corpus_id="id")
    qv = [float(x) for x in emb.orderBy("id").first()["embedding"]]
    hits = idx.search(qv, k=5, nprobe=3).collect()
    counts["search_hits"] = len(hits)

    print(json.dumps(counts))
    return counts


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="pipeline_out_")
    main(sf, out)
