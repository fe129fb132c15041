"""Pre-training-cut curation audit — the seventh example pipeline: the
readouts a data lead reviews BEFORE freezing a training mixture,
composed from the round-8/9 catalog operators over one documents corpus.

    documents ─┬─ dataset_datasheet    (per-source docs / lang mix /
               │                        entropy / exact-dup rate)
               ├─ tokenizer_fertility  (per-lang subword tax + bytes/token)
               ├─ doc_novelty          (memorization / boilerplate proxy)
               ├─ source_leakage       (cross-source near-dup matrix)
               └─ dedup accounting (r9): dup_cluster_sizes (what exact
                  dedup reclaims), dedup_survivors (who loses docs to
                  keep-one, incl. cross-source), near_dup_rate_by_source
                  (per-source fuzzy exposure)

Reading order matters: the datasheet says WHAT each source contributes;
fertility says what each language will COST in tokens; novelty flags the
documents that are assembled from corpus-common n-grams (candidates for
down-weighting); the leakage matrix finds source pairs that would
double-count the same text into two mixture buckets; the dedup
accounting says what the dedup pass will actually DO to the mix before
anyone runs it.  A mix decision made without these is guessing on at
least one axis.

Cross-readout invariants asserted by the smoke test
(tests/test_curation_audit_example.py):
  - datasheet doc counts reconcile exactly with the corpus row count;
  - every source pair in the leakage matrix names sources the datasheet
    knows, with source_a <= source_b (unordered normalization);
  - mean novelty over all docs is a weighted average of the per-doc
    readout (recomputed independently);
  - fertility >= 1 for every language (a word costs >= 1 subword);
  - total excess docs in the cluster histogram == total keep-one
    removals in the survivor table (two independent computations of the
    same quantity), and survivor n_docs reconciles with the datasheet
    per source.

Run: python examples/curation_audit_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main(sf_dir: str, spark=None) -> dict:
    stop_session = spark is None
    if spark is None:
        from mcpvectordb_spark.session import get_spark

        spark = get_spark("curation-audit")
    from mcpvectordb_spark.catalog._round8 import (
        q_dataset_datasheet,
        q_doc_novelty,
        q_source_leakage,
        q_tokenizer_fertility,
    )

    out: dict = {}

    # 1. the datasheet: what each source contributes
    ds = q_dataset_datasheet(spark, sf_dir).collect()
    out["datasheet"] = {
        r["source"]: {
            "n_docs": r["n_docs"],
            "n_langs": r["n_langs"],
            "lang_entropy": float(r["lang_entropy"]),
            "ws_tokens": r["ws_tokens"],
            "dup_rate": float(r["dup_rate"]),
        }
        for r in ds
    }

    # 2. what each language costs in tokens
    out["fertility"] = {
        r["lang"]: {
            "fertility": float(r["fertility"]),
            "bytes_per_token": float(r["bytes_per_token"]),
        }
        for r in q_tokenizer_fertility(spark, sf_dir).collect()
    }

    # 3. memorization proxy: corpus novelty distribution (quartile-ish
    # summary — the per-doc table is the artifact a down-weighting job
    # would consume; here we report its shape)
    nov = q_doc_novelty(spark, sf_dir)
    out["novelty"] = {
        "n_docs": nov.count(),
        "mean": round(
            float(nov.agg(F.avg("novelty")).first()[0]), 4
        ),
        "n_below_half": nov.filter(F.col("novelty") < 0.5).count(),
    }

    # 4. which source pairs share whole documents
    out["leakage"] = [
        {
            "pair": [r["source_a"], r["source_b"]],
            "n_pairs": r["n_pairs"],
            "mean_jaccard": float(r["mean_jaccard"]),
            "max_jaccard": float(r["max_jaccard"]),
        }
        for r in q_source_leakage(spark, sf_dir)
        .orderBy(F.col("n_pairs").desc(), "source_a", "source_b")
        .limit(10)
        .collect()
    ]

    # 5. dedup accounting (round-9): what the dedup pass will do to the
    # mix — reclaimable exact-dup mass, who loses docs under keep-one
    # (and to whom), and each source's fuzzy-dup exposure
    from mcpvectordb_spark.catalog._round9 import (
        q_dedup_survivors,
        q_dup_cluster_sizes,
        q_near_dup_rate_by_source,
    )

    out["dup_clusters"] = {
        int(r["cluster_size"]): {
            "n_clusters": r["n_clusters"],
            "n_excess_docs": r["n_excess_docs"],
            "excess_bytes": r["excess_bytes"],
        }
        for r in q_dup_cluster_sizes(spark, sf_dir).collect()
    }
    out["survivors"] = {
        r["source"]: {
            "n_docs": r["n_docs"],
            "n_removed": r["n_removed"],
            "n_lost_cross_source": r["n_lost_cross_source"],
            "removed_rate": float(r["removed_rate"]),
        }
        for r in q_dedup_survivors(spark, sf_dir).collect()
    }
    out["neardup_exposure"] = {
        r["source"]: {
            "n_neardup": r["n_neardup"],
            "neardup_rate": float(r["neardup_rate"]),
        }
        for r in q_near_dup_rate_by_source(spark, sf_dir).collect()
    }

    print(json.dumps(out))
    if stop_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
