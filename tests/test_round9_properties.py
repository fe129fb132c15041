"""Randomized-recount properties for the round-9 dedup accounting: on
seeded random corpora (duplicate texts, NULL texts, empty-ish sources),
`dup_cluster_sizes` and `dedup_survivors` must match an independent
pure-Python recount exactly — the kernel-properties discipline applied
to the readout layer (planted closed forms in test_round9_ops.py cover
the analytic extremes; this covers the messy middle)."""

import random
import sys
from collections import Counter, defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _random_corpus(seed: int):
    rng = random.Random(seed)
    texts = [None, "", "alpha beta", "alpha beta gamma", "delta epsilon",
             "zeta eta theta iota", "kappa"]
    rows = []
    for i in range(rng.randint(20, 60)):
        t = rng.choice(texts)
        rows.append(
            (i, t, rng.choice(["en", "fr"]), f"s{rng.randint(0, 3)}",
             len(t) if t else 0)
        )
    return rows


def _recount(rows):
    """Pure-Python keep-one accounting over md5(coalesce(text,''))."""
    import hashlib

    def dig(t):
        return hashlib.md5((t or "").encode()).hexdigest()

    clusters = defaultdict(list)  # dig -> [(doc_id, source, nbytes)]
    for doc_id, t, _lang, src, _nc in rows:
        clusters[dig(t)].append((doc_id, src, len((t or "").encode())))
    hist = Counter(len(v) for v in clusters.values())
    excess_bytes = Counter()
    for v in clusters.values():
        excess_bytes[len(v)] += (len(v) - 1) * v[0][2]
    surv = defaultdict(lambda: [0, 0, 0, 0])  # src -> [docs, removed, bytes, cross]
    for v in clusters.values():
        keep_id, keep_src, _ = min(v)
        for doc_id, src, nb in v:
            surv[src][0] += 1
            if doc_id != keep_id:
                surv[src][1] += 1
                surv[src][2] += nb
                if src != keep_src:
                    surv[src][3] += 1
    return hist, excess_bytes, surv


def test_dup_accounting_matches_python_recount(spark, tmp_path):
    from mcpvectordb_spark.catalog._round9 import (
        q_dedup_survivors,
        q_dup_cluster_sizes,
    )

    for seed in (7, 23, 91):
        rows = _random_corpus(seed)
        d = tmp_path / f"c{seed}"
        d.mkdir()
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(str(d / "documents.parquet"))

        hist, excess_bytes, surv = _recount(rows)

        got_hist = {r["cluster_size"]: r for r in
                    q_dup_cluster_sizes(spark, str(d)).collect()}
        assert set(got_hist) == set(hist), seed
        for size, r in got_hist.items():
            assert r["n_clusters"] == hist[size], (seed, size)
            assert r["n_docs"] == size * hist[size]
            assert r["n_excess_docs"] == (size - 1) * hist[size]
            assert r["excess_bytes"] == excess_bytes[size], (seed, size)

        got_surv = {r["source"]: r for r in
                    q_dedup_survivors(spark, str(d)).collect()}
        assert set(got_surv) == set(surv), seed
        for src, (n_docs, n_removed, b_removed, n_cross) in surv.items():
            r = got_surv[src]
            assert (r["n_docs"], r["n_removed"]) == (n_docs, n_removed), (seed, src)
            assert r["n_kept"] == n_docs - n_removed
            assert r["bytes_removed"] == b_removed, (seed, src)
            assert r["n_lost_cross_source"] == n_cross, (seed, src)
            assert r["removed_rate"] == round(n_removed / n_docs, 6)


def test_ngram_coverage_matches_python_recount(spark, tmp_path):
    """Coverage curve vs a plain-Python shingle recount on a corpus with
    heavy shared boilerplate plus unique tails (exercises ties on the
    (df, shingle) cut key)."""
    from mcpvectordb_spark.catalog._round9 import q_ngram_coverage

    rng = random.Random(5)
    words = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(30):
        body = ["common", "header", "line"] + [rng.choice(words) for _ in range(6)]
        rows.append((i, " ".join(body), "en", "s", 40))
    d = tmp_path / "cov"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    # python recount: distinct shingles per doc, df per shingle
    df_count = Counter()
    total = 0
    for _i, t, *_ in rows:
        ws = t.split()
        sh = {" ".join(ws[j:j + 3]) for j in range(len(ws) - 2)}
        total += len(sh)
        for s in sh:
            df_count[s] += 1
    want = sorted(df_count.items(), key=lambda kv: (-kv[1], kv[0]))[:100]

    got = q_ngram_coverage(spark, str(d)).collect()
    assert [(r["shingle"], r["df"]) for r in got] == want
    cum = 0
    for r, (_s, df) in zip(got, want):
        cum += df
        assert r["share"] == round(df / total, 6)
        assert r["cum_share"] == round(cum / total, 6)
