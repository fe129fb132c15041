"""Regenerate the golden (n_rows, digest) constants for the digest-gated
deterministic queries (catalog._digest_gate).

Runs each gated query TWICE at sf0.01 and refuses to emit a golden unless
both runs agree — a digest that differs between two in-process runs would
make the driver row flaky, which is worse than rows-only.

Usage:  python tools/regen_digests.py          # print constants
        python tools/regen_digests.py --check  # exit 1 if catalog constants are stale
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
GATED = [
    "ingest_chunks",
    "search_ingested",
    "neardup_lsh_embeddings",
    "multimodal_features",
    "warc_ingest",
    "bpe_train",
    "pack_bins",
    "semdedup_refined",
    "cdc_dedup",
    "multimodal_image_features",
    "knn_pq_refined",
    "knn_pca",
    "multimodal_image_neardup",
    "multimodal_video_framedup",
    "bpe_encode",
    "text_compression",
    "multimodal_exif",
    "ocr_ingest",
    "asr_ingest",
    "flac_ingest",
    "w2v_search",
    "audio_fingerprint",
]


def main() -> int:
    from mcpvectordb_spark import catalog
    from mcpvectordb_spark.session import get_spark

    spark = get_spark("regen-digests")
    check = "--check" in sys.argv
    stale = []
    for name in GATED:
        fn = catalog.QUERIES[name]
        a = fn(spark, SF_DIR).collect()[0]
        b = fn(spark, SF_DIR).collect()[0]
        if (a["n_rows"], a["digest"]) != (b["n_rows"], b["digest"]):
            print(f"FLAKY {name}: {a} != {b} — NOT deterministic, no golden emitted")
            return 2
        gold = catalog._sql_digest_gold(a["n_rows"], a["digest"])
        if check:
            current = catalog.ORACLES.get(name)
            mark = "ok   " if current == gold else "STALE"
            if current != gold:
                stale.append(name)
            print(f"{mark} {name}: {gold}")
        else:
            print(f'    "{name}": _sql_digest_gold({a["n_rows"]}, "{a["digest"]}"),')
    return 1 if stale else 0


if __name__ == "__main__":
    raise SystemExit(main())
