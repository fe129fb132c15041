"""Smoke + cross-readout invariants for examples/curation_audit_pipeline.py."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"


def test_curation_audit_invariants(spark):
    from pyspark.sql import functions as F

    from examples.curation_audit_pipeline import main
    from mcpvectordb_spark.io import load_table

    out = main(SF, spark=spark)

    # datasheet doc counts reconcile exactly with the corpus
    docs = load_table(spark, SF, "documents")
    assert sum(s["n_docs"] for s in out["datasheet"].values()) == docs.count()

    # fertility >= 1 for every language; bytes/token positive
    for lang, f in out["fertility"].items():
        assert f["fertility"] >= 1.0, lang
        assert f["bytes_per_token"] > 0

    # leakage pairs are normalized and name known sources
    known = set(out["datasheet"])
    for row in out["leakage"]:
        a, b = row["pair"]
        assert a <= b
        assert a in known and b in known
        assert 0.02 <= row["mean_jaccard"] <= row["max_jaccard"] + 1e-9

    # novelty mean recomputed independently from the per-doc readout
    from mcpvectordb_spark.catalog._round8 import q_doc_novelty

    nov = q_doc_novelty(spark, SF)
    mean = float(nov.agg(F.avg("novelty")).first()[0])
    assert out["novelty"]["mean"] == pytest.approx(mean, abs=1e-4)
    assert 0 <= out["novelty"]["n_below_half"] <= out["novelty"]["n_docs"]

    # r9 dedup accounting: the cluster histogram's total excess docs and
    # the survivor table's total removals are two INDEPENDENT
    # computations of the same keep-one quantity — they must agree
    # exactly; survivor n_docs reconciles with the datasheet per source
    total_excess = sum(c["n_excess_docs"] for c in out["dup_clusters"].values())
    total_removed = sum(s["n_removed"] for s in out["survivors"].values())
    assert total_excess == total_removed
    assert set(out["survivors"]) == set(out["datasheet"])
    for src, s in out["survivors"].items():
        assert s["n_docs"] == out["datasheet"][src]["n_docs"]
        assert s["n_lost_cross_source"] <= s["n_removed"]

    # fuzzy exposure names every source, bounded rates
    assert set(out["neardup_exposure"]) == set(out["datasheet"])
    for src, e in out["neardup_exposure"].items():
        assert 0.0 <= e["neardup_rate"] <= 1.0
