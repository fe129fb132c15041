"""The examples/ end-to-end pipeline must keep running as operators evolve:
load → curate → near-dup CC → decontaminate → mixture → pack/shard → IVF."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_train_data_pipeline_funnel(spark, tmp_path):
    import importlib.util

    path = Path(__file__).resolve().parent.parent / "examples" / "train_data_pipeline.py"
    spec = importlib.util.spec_from_file_location("train_data_pipeline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    counts = mod.main("/root/testdata/sf0.001", str(tmp_path / "out"))
    # the funnel only narrows, and every stage leaves a real corpus
    order = ["loaded", "after_curation", "after_neardup", "after_hygiene",
             "after_decontamination", "after_mixture", "train_docs"]
    vals = [counts[k] for k in order]
    assert vals == sorted(vals, reverse=True) and vals[-1] > 0, counts
    assert counts["sharded_docs"] == counts["train_docs"]
    assert counts["bins"] > 0 and counts["search_hits"] == 5
    assert counts["repetitive_shipped"] == 0  # the synthetic corpus is clean
