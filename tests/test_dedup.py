"""Dedup family: exact groups, Jaccard math, MinHash-LSH recall on planted
near-dups, SimHash stability, embedding LSH vs brute-force recall."""

import math

from pyspark.sql import functions as F

from mcpvectordb_spark.operators.dedup import (
    embedding_neardup_pairs,
    embedding_neardup_pairs_lsh,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
    word_shingles,
)


def corpus(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_duplicates_normalization(spark):
    df = corpus(spark, [
        (1, "Hello   World"),
        (2, "hello world"),        # same after normalization
        (3, "HELLO\tWORLD  "),     # same after normalization
        (4, "something else"),
    ])
    groups = exact_duplicates(df, "id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["dup_count"] == 3
    assert groups[0]["ids"] == [1, 2, 3]


def test_jaccard_known_value(spark):
    # shingle sets: {a b c, b c d} vs {a b c, b c x} → intersection 1, union 3
    df = corpus(spark, [(1, "a b c d"), (2, "a b c x")])
    pairs = ngram_jaccard_pairs(df, "id", "text", n=3, threshold=0.0).collect()
    assert len(pairs) == 1
    assert math.isclose(pairs[0]["jaccard"], 1 / 3, rel_tol=1e-9)


def test_short_doc_has_no_shingles(spark):
    df = spark.createDataFrame([("x y",)], "text string")
    assert df.select(word_shingles(F.col("text"), 3).alias("s")).first()["s"] == []


def test_minhash_lsh_finds_planted_neardups(spark, mini_docs):
    base = mini_docs.select(F.monotonically_increasing_id().alias("id"), F.col("content").alias("text"))
    mutated = base.select((F.col("id") + 1000).alias("id"), F.concat("text", F.lit(" tail word")).alias("text"))
    both = base.unionByName(mutated)
    # r=2 band geometry: P(candidate) = 1-(1-J²)^8 ≈ 1 at J≥0.9 (with
    # honest independent hashes; wider bands would miss ~10% of J=0.9 pairs)
    pairs = minhash_lsh_pairs(both, "id", "text", num_hashes=16, bands=8, threshold=0.5)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {(r["id"], r["id"] + 1000) for r in base.collect()}
    # high-similarity planted pairs must be recovered (tiny docs may fall
    # below threshold after mutation; require ≥ the 3 long docs)
    assert len(found & planted) >= 3


def test_minhash_signature_is_similarity_preserving(spark):
    df = corpus(spark, [
        (1, " ".join(f"w{i}" for i in range(100))),
        (2, " ".join(f"w{i}" for i in range(100)) + " extra"),
        (3, " ".join(f"z{i}" for i in range(100))),
    ])
    sigs = {r["id"]: [r[f"mh{i}"] for i in range(16)] for r in minhash_signatures(df, "id", "text", 16).collect()}
    agree_12 = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree_12 > agree_13
    assert agree_13 == 0


def test_simhash_stable_and_near_for_neardups(spark):
    df = corpus(spark, [
        (1, " ".join(f"w{i}" for i in range(200))),
        (2, " ".join(f"w{i}" for i in range(200))),
    ])
    fps = {r["id"]: r["simhash"] for r in simhash(df, "id", "text").collect()}
    assert fps[1] == fps[2]
    pairs = simhash_pairs(df, "id", "text", max_hamming=0).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


def test_embedding_lsh_never_fabricates(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    brute = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(emb, "vec_id", threshold=0.35).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_neardup_pairs_lsh(emb, "vec_id", threshold=0.35, num_planes=8, num_tables=6).collect()}
    assert lsh <= brute, "LSH must never fabricate pairs (it verifies exactly)"


def test_embedding_lsh_recall_on_true_neardups(spark):
    """Sign-LSH is built for high-similarity pairs: plant near-identical
    copies (tiny deterministic perturbation → cos ≈ 0.999) and require
    ≳90% recall.  (At cos 0.35 the expected collision rate is ~11% by the
    (1−θ/π)^planes formula — that regime is the brute operator's job.)"""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    copies = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001) + F.lit(1e-4)).alias("embedding"),
    )
    both = emb.select("vec_id", "embedding").unionByName(copies)
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_neardup_pairs_lsh(both, "vec_id", threshold=0.99, num_planes=8, num_tables=6).collect()}
    planted = {(r["vec_id"], r["vec_id"] + 100000) for r in emb.collect()}
    recall = len(lsh & planted) / len(planted)
    assert recall >= 0.9, f"LSH recall on true near-dups: {recall}"


def test_dedup_clusters_transitive_chains(spark):
    """Connected components: a~b and b~c must land a, b, c in ONE cluster
    even if a and c are not directly similar (transitive closure)."""
    from mcpvectordb_spark.operators.dedup import dedup_clusters

    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.9), (4, 5, 0.8)],  # chain {1,2,3}, pair {4,5}, singleton {6}
        "id_a long, id_b long, jaccard double",
    )
    out = {r["id"]: r["cluster_id"] for r in dedup_clusters(ids, pairs, "id").collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_dedup_lines_c4_semantics(spark):
    """Boilerplate (count >= min_count corpus-wide) is stripped from every
    doc; unique and empty lines survive; order of survivors is preserved;
    an all-boilerplate doc collapses to the empty string."""
    import hashlib

    from mcpvectordb_spark.operators.dedup import dedup_lines

    docs = [
        (1, "BANNER\nkeep me one\n\nBANNER"),     # banner twice in same doc
        (2, "BANNER\nkeep me two"),
        (3, "  BANNER  \nkeep me three"),          # trims before matching
        (4, "BANNER"),                             # collapses to ''
        (5, None),                                 # null text → 1 empty line
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df, "doc_id", "text", min_count=3).collect()}

    assert set(out) == {1, 2, 3, 4, 5}  # every input doc has a row
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # BANNER occurs 5x (>=3) → removed everywhere; blank + unique lines kept
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (4, 2)
    assert out[1]["clean_md5"] == md5("keep me one\n")
    assert out[2]["clean_md5"] == md5("keep me two")
    assert out[3]["n_removed"] == 1 and out[3]["clean_md5"] == md5("keep me three")
    assert out[4]["clean_md5"] == md5("")
    assert (out[5]["n_lines"], out[5]["n_removed"]) == (1, 0)


def test_dedup_lines_below_threshold_keeps_all(spark):
    from mcpvectordb_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [(1, "twice\nunique a"), (2, "twice\nunique b")], "doc_id long, text string"
    )
    out = dedup_lines(df, "doc_id", "text", min_count=3).collect()
    assert all(r["n_removed"] == 0 for r in out)


def test_dup_span_fraction_flags_cross_doc_only(spark):
    """Shared 8-token spans across docs flag both members; within-doc
    repetition alone does not count as duplication."""
    from mcpvectordb_spark.operators.dedup import dup_span_fraction

    shared = "one two three four five six seven eight"
    rows = [
        (1, shared + " tail a"),
        (2, shared + " tail b"),                   # shares the 8-gram with 1
        (3, "unique words only here nothing repeats at all"),
        (4, (shared + " ") * 3),                   # within-doc repeat + cross-doc
        (5, "short text"),                         # < 8 words → no windows
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in dup_span_fraction(df, "id", "text", k=8).collect()}
    assert out[1]["dup_windows"] >= 1 and out[2]["dup_windows"] >= 1
    assert out[3]["dup_windows"] == 0
    assert out[4]["dup_frac"] > 0                  # cross-doc via 1/2
    assert 5 not in out                            # no windows → no row

    solo = spark.createDataFrame(
        [(1, ("alpha beta gamma delta epsilon zeta eta theta " * 3))],
        "id long, text string",
    )
    solo_out = dup_span_fraction(solo, "id", "text", k=8).collect()
    assert solo_out[0]["dup_windows"] == 0         # within-doc repeats alone don't flag


# ---------------------------------------------------------------------------
# SemDeDup: cluster-bucketed cosine dedup


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def test_semdedup_drops_only_planted_copies(spark):
    """Orthogonal base vectors (cosine 0 across clusters) + exact copies:
    every copy is dropped against its lower-id twin, originals survive."""
    from mcpvectordb_spark.operators.dedup import semdedup

    base = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
    ]
    copies = [(100 + i, v) for i, v in base]                # sim 1.0 to original
    near = [(200, [0.999, 0.01, 0.0, 0.0])]                 # near id 0, above thr
    far = [(300, [0.7, 0.7, 0.0, 0.0])]                     # ~0.707 to 0 and 1 — below
    df = _vec_df(spark, base + copies + near + far)
    out = {r["id"]: r for r in
           semdedup(df, "id", "embedding", k=4, threshold=0.9).collect()}
    assert set(out) == {100, 101, 102, 103, 200}
    assert out[100]["max_sim"] == 1.0
    assert out[200]["cluster_id"] == 0  # assigned to the cell of its twin


def test_semdedup_tie_breaks_to_lowest_centroid(spark):
    """A vector equidistant from two centroids lands in the lower cid —
    the determinism the SQL oracle's row_number ordering reproduces."""
    from mcpvectordb_spark.operators.dedup import assign_clusters, lowest_id_centroids

    df = _vec_df(spark, [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 1.0]),   # cosine ≈ 0.7071 to both centroids
    ])
    cents = lowest_id_centroids(df, "id", "embedding", 2)
    got = {r["id"]: r["cluster_id"] for r in
           assign_clusters(df, cents, "id", "embedding").collect()}
    assert got == {0: 0, 1: 1, 2: 0}


def test_kmeans_refine_matches_numpy_twin(spark):
    """Distributed Lloyd (spherical) == a local NumPy implementation, on a
    deterministic corpus with planted cluster structure."""
    import numpy as np

    from mcpvectordb_spark.operators.dedup import kmeans_refine, lowest_id_centroids

    rng = np.random.RandomState(7)
    centers = np.eye(3)
    pts = []
    for i in range(60):
        c = i % 3
        v = centers[c] + 0.05 * rng.randn(3)
        pts.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    df = _vec_df(spark, pts)

    seed = lowest_id_centroids(df, "id", "embedding", 3)
    got = {r["cid"]: np.array(r["cvec"]) for r in
           kmeans_refine(df, seed, "id", "embedding", iters=2).collect()}

    # local twin: same seed, same assignment rule (max cosine, lowest-cid tie)
    X = np.array([p[1] for p in pts])
    C = X[:3].copy()
    cids = np.array([0, 1, 2])
    for _ in range(2):
        sims = X @ C.T  # unit vectors → dot == cosine
        assign = cids[np.argmax(sims, axis=1)]  # argmax takes first (lowest) on ties
        newC, newIds = [], []
        for cid in cids:
            members = X[assign == cid]
            if len(members) == 0:
                continue
            m = members.mean(axis=0)
            newC.append(m / np.linalg.norm(m))
            newIds.append(cid)
        C, cids = np.array(newC), np.array(newIds)
    for cid, cv in zip(cids, C):
        assert int(cid) in got
        assert np.allclose(got[int(cid)], cv, atol=1e-9), cid


def test_semdedup_plan_shape(spark):
    """Assignment is a broadcast (one BNLJ for the k-centroid crossJoin,
    never a CartesianProduct); pair verification is a real hash/merge join
    keyed on cluster_id."""
    from mcpvectordb_spark.catalog import QUERIES
    from mcpvectordb_spark.plans.explain import formatted_plan

    tree = formatted_plan(QUERIES["semdedup"](spark, "/root/testdata/sf0.001")).split("\n\n")[0]
    assert "CartesianProduct" not in tree, tree
    assert tree.count("BroadcastNestedLoopJoin") <= 2, tree  # 2 assignments (a & b legs)
    assert ("SortMergeJoin" in tree) or ("ShuffledHashJoin" in tree) \
        or ("BroadcastHashJoin" in tree), tree


def test_assign_clusters_pandas_matches_expr(spark):
    """The BLAS assignment path buckets identically to the codegen path on
    the test corpus (same argmax, same lowest-cid tie-break)."""
    from mcpvectordb_spark.operators.dedup import assign_clusters, lowest_id_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select(F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("embedding"))
    cents = lowest_id_centroids(emb, "id", "embedding", 8)
    a = {r["id"]: r["cluster_id"] for r in
         assign_clusters(emb, cents, "id", "embedding", impl="expr").collect()}
    b = {r["id"]: r["cluster_id"] for r in
         assign_clusters(emb, cents, "id", "embedding", impl="pandas").collect()}
    assert a == b


def test_semdedup_pandas_impl_same_verdicts(spark):
    from mcpvectordb_spark.operators.dedup import semdedup

    base = [(i, [1.0 * (i == j) for j in range(4)]) for i in range(4)]
    copies = [(100 + i, v) for i, v in base]
    df = spark.createDataFrame(base + copies, "id long, embedding array<double>")
    for impl in ("expr", "pandas"):
        out = {r["id"] for r in
               semdedup(df, "id", "embedding", k=4, threshold=0.9, impl=impl).collect()}
        assert out == {100, 101, 102, 103}, impl


def test_twostar_components_long_chain(spark):
    """A 200-link chain: label propagation needs diameter rounds; two-star
    must collapse it to one cluster within its log² budget."""
    from mcpvectordb_spark.operators.dedup import dedup_clusters_twostar

    ids = spark.createDataFrame([(i,) for i in range(201)], "id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    out = dedup_clusters_twostar(ids, pairs, max_iter=12)
    labels = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert set(labels.values()) == {0} and len(labels) == 201


def test_twostar_matches_union_find_ground_truth(spark):
    import random

    from mcpvectordb_spark.operators.dedup import dedup_clusters_twostar

    rng = random.Random(11)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(180)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    truth = {}
    for i in range(n):
        truth.setdefault(find(i), []).append(i)
    want = {i: min(members) for members in truth.values() for i in members}

    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"]
           for r in dedup_clusters_twostar(ids, pairs).collect()}
    assert got == want


def test_twostar_equals_propagation_on_shallow_graph(spark):
    from mcpvectordb_spark.operators.dedup import dedup_clusters, dedup_clusters_twostar

    ids = spark.createDataFrame([(i,) for i in range(20)], "id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (6, 7), (5, 7), (10, 11)], "id_a long, id_b long"
    )
    a = sorted(map(tuple, dedup_clusters(ids, pairs).collect()))
    b = sorted(map(tuple, dedup_clusters_twostar(ids, pairs).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC)


def test_cdc_boundaries_invariants():
    from mcpvectordb_spark.operators.dedup import cdc_boundaries

    data = "".join(f"the quick brown fox {i} " for i in range(400)).encode()
    chunks = cdc_boundaries(data, min_size=64, avg_size=256, max_size=1024)
    assert b"".join(chunks) == data                      # lossless
    assert all(64 <= len(c) <= 1024 for c in chunks[:-1])  # bounds (last may be short)
    assert len(chunks) > 2


def test_cdc_survives_insertion_where_fixed_blocks_dont():
    """The CDC selling point: a prefix insertion shifts every byte, yet most
    downstream chunks keep their identity; fixed-size blocking loses ALL."""
    import hashlib
    import random

    from mcpvectordb_spark.operators.dedup import cdc_boundaries

    rng = random.Random(3)
    base = bytes(rng.randrange(256) for _ in range(20000))
    shifted = b"INSERTED-PREFIX-BYTES:" + base

    def digests(blob, fixed=None):
        if fixed:
            parts = [blob[i:i + fixed] for i in range(0, len(blob), fixed)]
        else:
            parts = cdc_boundaries(blob, 64, 256, 1024)
        return {hashlib.md5(p).hexdigest() for p in parts}

    cdc_shared = len(digests(base) & digests(shifted)) / len(digests(base))
    fixed_shared = len(digests(base, 256) & digests(shifted, 256)) / len(digests(base, 256))
    assert cdc_shared > 0.8, cdc_shared   # boundaries resync after the edit
    assert fixed_shared < 0.05, fixed_shared  # fixed blocks all shifted


def test_cdc_dedup_stats_stage(spark):
    from mcpvectordb_spark.operators.dedup import cdc_chunk_stage, cdc_dedup_stats

    text = "shared corpus content repeated " * 200
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different material " * 150)],
        "id long, text string",
    )
    chunks = cdc_chunk_stage(df, "id", "text")
    rows = chunks.collect()
    assert {r["id"] for r in rows} == {1, 2, 3}
    stats = cdc_dedup_stats(chunks).first()
    assert stats["total_chunks"] > stats["unique_chunks"]  # docs 1/2 dedup away
    assert 0 < stats["dedup_ratio"] < 1
    # doc 1 and 2 are byte-identical → their digest multisets match
    d1 = sorted(r["digest"] for r in rows if r["id"] == 1)
    d2 = sorted(r["digest"] for r in rows if r["id"] == 2)
    assert d1 == d2


def test_remove_dup_spans_rewrite_semantics(spark):
    """Planted copies lose exactly their shared spans from BOTH members;
    unique docs are untouched; full duplicates empty out; order of the
    surviving tokens is preserved."""
    from pyspark.sql import functions as F

    from mcpvectordb_spark.operators.dedup import remove_dup_spans

    shared = "one two three four five six seven eight nine ten"
    rows = [
        (0, shared + " alpha beta gamma delta epsilon zeta eta theta"),
        (1, shared + " iota kappa lam mu nu xi omicron pi"),   # shares the 10-token prefix
        (2, "totally unique words appear here just once only ever written down"),
        (3, shared),                                            # exact dup of the span
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in remove_dup_spans(df, "id", "text", k=8).collect()}

    # doc 2 untouched
    assert out[2]["n_removed"] == 0
    assert out[2]["cleaned_text"] == rows[2][1]
    # doc 3 is nothing but the shared span -> fully removed
    assert out[3]["n_removed"] == out[3]["n_tokens"] == 10
    assert out[3]["cleaned_text"] == ""
    # docs 0/1: the shared 10-token prefix is covered (all its 8-windows are
    # cross-doc); the unique tails survive intact and in order
    assert out[0]["cleaned_text"] == "alpha beta gamma delta epsilon zeta eta theta"
    assert out[1]["cleaned_text"] == "iota kappa lam mu nu xi omicron pi"
    assert out[0]["n_removed"] == 10


def test_remove_dup_spans_short_docs_never_touched(spark):
    from mcpvectordb_spark.operators.dedup import remove_dup_spans

    rows = [(0, "a b c d e f g"), (1, "a b c d e f g")]  # 7 tokens < k=8
    df = spark.createDataFrame(rows, "id long, text string")
    out = remove_dup_spans(df, "id", "text", k=8).collect()
    assert all(r["n_removed"] == 0 for r in out)
    assert all(r["cleaned_text"] == "a b c d e f g" for r in out)


def test_hamming_neardup_pairs_complete_vs_bruteforce(spark):
    """Pigeonhole block join must find EXACTLY the brute-force pair set —
    completeness is a theorem (dist <= max_dist -> some block equal), this
    pins the implementation (block widths, unsigned shifts, sign wrap)."""
    import itertools
    import random

    from mcpvectordb_spark.operators.dedup import hamming_neardup_pairs

    rng = random.Random(11)
    base = [rng.getrandbits(64) for _ in range(30)]
    vals = list(base)
    for i in range(15):  # planted near copies: flip 1..6 bits of base[i]
        v = base[i]
        for b in rng.sample(range(64), rng.randint(1, 6)):
            v ^= 1 << b
        vals.append(v)
    signed = [v - (1 << 64) if v >= (1 << 63) else v for v in vals]
    df = spark.createDataFrame(list(enumerate(signed)), "id long, h long")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in hamming_neardup_pairs(df, "id", "h", bits=64, max_dist=6).collect()
    }
    # both candidate strategies must produce the identical exact pair set
    for strat in ("block", "block1"):
        alt = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in hamming_neardup_pairs(
                df, "id", "h", bits=64, max_dist=6, strategy=strat
            ).collect()
        }
        assert alt == got, strat
    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(vals), 2):
        d = bin(a ^ b).count("1")
        if d <= 6:
            want[(i, j)] = d
    assert got == want
    assert len(want) >= 15  # the plants are all in


def test_dhash_stability_and_sensitivity():
    import numpy as np

    from mcpvectordb_spark.sources.multimodal import dhash64

    rng = np.random.default_rng(3)
    # smooth gradient image
    y, x = np.mgrid[0:64, 0:64]
    img = np.stack([(2 * x + 3 * y) % 256] * 3, axis=2).astype(np.uint8)
    h0 = dhash64(img)
    # identical pixels -> identical hash
    assert dhash64(img.copy()) == h0
    # small local patch edit -> small Hamming distance
    pert = img.copy()
    pert[10:14, 10:14] = np.clip(pert[10:14, 10:14].astype(int) + 30, 0, 255).astype(np.uint8)
    d_small = bin((dhash64(pert) ^ h0) & ((1 << 64) - 1)).count("1")
    assert d_small <= 6
    # a different gradient direction -> far
    img2 = np.stack([(5 * x - 2 * y) % 256] * 3, axis=2).astype(np.uint8)
    d_big = bin((dhash64(img2) ^ h0) & ((1 << 64) - 1)).count("1")
    assert d_big > 10


def test_tfidf_cosine_pairs_hand_computed(spark):
    """Exact cosine on a 3-doc corpus, and the max_df cutoff removes a
    universal stop term from the vectorization entirely."""
    import math

    import pytest

    from mcpvectordb_spark.operators.simjoin import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "the dog ran")],
        "id long, text string",
    )
    # max_df=2 cuts 'the' (df=3); N=3, idf(df=2)=ln(1.5), idf(df=1)=ln(3)
    out = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           tfidf_cosine_pairs(docs, "id", "text", threshold=0.0, max_df=2).collect()}
    w2, w1 = math.log(1.5), math.log(3.0)
    # doc1 = {cat:w2, sat:w1}, doc2 = {cat:w2, ran:w2}, doc3 = {dog:w1, ran:w2}
    expect = w2 * w2 / (math.hypot(w2, w1) * (w2 * math.sqrt(2.0)))
    assert out[(1, 2)] == pytest.approx(expect, rel=1e-12)  # share 'cat'
    assert out[(2, 3)] == pytest.approx(expect, rel=1e-12)  # share 'ran'
    assert (1, 3) not in out or out[(1, 3)] == 0.0  # share only 'the' (cut)


def test_tfidf_cosine_identical_docs_score_one(spark):
    import pytest

    from mcpvectordb_spark.operators.simjoin import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "unrelated words entirely different")],
        "id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           tfidf_cosine_pairs(docs, "id", "text", threshold=0.9).collect()}
    assert list(out) == [(1, 2)]
    assert out[(1, 2)] == pytest.approx(1.0, rel=1e-12)


def test_containment_finds_fragment_jaccard_misses(spark):
    """A short doc fully embedded in a long one: containment(frag->full)=1
    while Jaccard is small; direction matters (full->frag is low)."""
    import pytest

    from mcpvectordb_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    frag = "alpha beta gamma delta epsilon"
    full = frag + " " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame([(1, frag), (2, full)], "id long, text string")

    jac = ngram_jaccard_pairs(docs, "id", "text", n=3, threshold=0.5).collect()
    assert jac == []                                   # symmetric measure misses it
    cont = {(r["id_a"], r["id_b"]): r["containment"] for r in
            ngram_containment_pairs(docs, "id", "text", n=3, threshold=0.9).collect()}
    assert cont[(1, 2)] == pytest.approx(1.0)          # fragment ⊆ full
    assert (2, 1) not in cont                          # not the other way
