"""Round-6 second-batch operator tests: Shapley attribution, Gini stump,
chi-square term selection, replayable Lloyd k-means.

Each operator gets (a) a planted-fixture assertion where the ground
truth is computed analytically or by brute force in Python, and (b) the
degenerate-corpus discipline from round 5: constant labels, single
classes, no conversions — every readout stays definite (no NULL verdict
columns) and no query crashes."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# shapley_attribution
# ---------------------------------------------------------------------------


def _events_df(spark, journeys):
    """journeys: list of (user_id, [event_type, ...])."""
    rows = []
    i = 0
    for uid, types in journeys:
        for t in types:
            rows.append(Row(user_id=uid, event_type=t))
            i += 1
    return spark.createDataFrame(rows)


def _brute_shapley(journeys, channels, conversion="purchase"):
    """Exact Shapley by enumerating all coalitions in pure Python."""
    k = len(channels)
    users = {}
    for uid, types in journeys:
        m, conv = users.get(uid, (0, 0))
        for t in types:
            if t in channels:
                m |= 1 << channels.index(t)
            if t == conversion:
                conv = 1
        users[uid] = (m, conv)

    def v(s):
        return sum(conv for m, conv in users.values() if m & ~s == 0)

    phi = {}
    for i, c in enumerate(channels):
        total = 0.0
        for s in range(1 << k):
            if s & (1 << i):
                continue
            size = bin(s).count("1")
            w = (
                math.factorial(size)
                * math.factorial(k - 1 - size)
                / math.factorial(k)
            )
            total += w * (v(s | (1 << i)) - v(s))
        phi[c] = total
    return phi


def test_shapley_matches_bruteforce_enumeration(spark):
    from mcpvectordb_spark.operators.analytics import shapley_attribution

    channels = ["click", "error", "signup", "view"]
    journeys = [
        (1, ["view", "click", "purchase"]),
        (2, ["view", "purchase"]),
        (3, ["click", "signup"]),
        (4, ["error", "view", "click", "purchase"]),
        (5, ["signup", "purchase"]),
        (6, ["view"]),
        (7, ["purchase"]),  # converts with the empty coalition
    ]
    out = {
        r["channel"]: r
        for r in shapley_attribution(
            _events_df(spark, journeys), channels
        ).collect()
    }
    expected = _brute_shapley(journeys, channels)
    for c in channels:
        assert out[c]["shapley"] == pytest.approx(expected[c], abs=1e-6)
    # efficiency: sum(phi) == v(C) - v(empty) == 4 converters reachable
    # with all channels minus the 1 bare-purchase user
    assert sum(r["shapley_num"] for r in out.values()) == 24 * (5 - 1)


def test_shapley_symmetric_channels_get_equal_credit(spark):
    """Two channels that appear in exactly the same journeys must receive
    identical credit (the symmetry axiom — heuristics like U-shaped break
    it under reordering, Shapley cannot)."""
    from mcpvectordb_spark.operators.analytics import shapley_attribution

    journeys = [
        (1, ["view", "click", "purchase"]),
        (2, ["view", "click", "purchase"]),
        (3, ["signup"]),
    ]
    out = {
        r["channel"]: r["shapley_num"]
        for r in shapley_attribution(
            _events_df(spark, journeys), ["click", "signup", "view"]
        ).collect()
    }
    assert out["view"] == out["click"]
    assert out["signup"] == 0


def test_shapley_no_conversions_definite_zero_share(spark):
    """Degenerate corpus: zero conversions anywhere -> every phi is 0 and
    share coalesces to 0.0 (definite, never NULL)."""
    from mcpvectordb_spark.operators.analytics import shapley_attribution

    journeys = [(1, ["view", "click"]), (2, ["signup"])]
    rows = shapley_attribution(
        _events_df(spark, journeys), ["click", "signup", "view"]
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["shapley_num"] == 0
        assert r["shapley"] == 0.0
        assert r["share"] == 0.0  # not None


def test_shapley_rejects_oversized_channel_set(spark):
    from mcpvectordb_spark.operators.analytics import shapley_attribution

    with pytest.raises(ValueError):
        shapley_attribution(
            _events_df(spark, [(1, ["a"])]), [f"c{i}" for i in range(13)]
        )


# ---------------------------------------------------------------------------
# gini_stump
# ---------------------------------------------------------------------------


def test_stump_finds_planted_perfect_split(spark):
    """Label is exactly (x <= 10): the stump must pick feature 'x' at
    split 10 with gain == gini_root and 100% training accuracy."""
    from mcpvectordb_spark.operators.classify import gini_stump

    rows = [Row(x=i, z=i % 3, y=(i <= 10)) for i in range(1, 21)]
    df = spark.createDataFrame(rows)
    out = gini_stump(
        df, {"x": F.col("x"), "z": F.col("z")}, F.col("y")
    ).collect()[0]
    assert out["feature"] == "x"
    assert out["split_x"] == 10
    assert out["n_correct"] == out["n"] == 20
    assert out["gain"] == pytest.approx(out["gini_root"], abs=1e-9)


def test_stump_constant_label_zero_gain_definite(spark):
    """Degenerate corpus: constant label -> gini_root == 0, every gain is
    0, output is still exactly one definite row (tiebreak picks the first
    (feature, x) candidate)."""
    from mcpvectordb_spark.operators.classify import gini_stump

    df = spark.createDataFrame([Row(x=i, y=True) for i in range(5)])
    out = gini_stump(df, {"x": F.col("x")}, F.col("y")).collect()
    assert len(out) == 1
    assert out[0]["gini_root"] == 0.0
    assert out[0]["gain"] == 0.0
    assert out[0]["n_correct"] == 5


def test_stump_prefers_higher_gain_feature(spark):
    """x separates perfectly, z is noise: brute-force the best weighted
    Gini over all candidates in Python and compare."""
    from mcpvectordb_spark.operators.classify import gini_stump

    rows = [Row(x=i, z=(i * 7) % 5, y=(i % 4 == 0)) for i in range(40)]
    df = spark.createDataFrame(rows)
    out = gini_stump(df, {"x": F.col("x"), "z": F.col("z")}, F.col("y")).collect()[0]

    data = [(r.x, r.z, int(r.y)) for r in rows]
    n = len(data)
    p = sum(y for _, _, y in data)

    def mass(nn, pp):
        if nn == 0:
            return 0.0
        q = nn - pp
        return nn - (pp * pp + q * q) / nn

    root = mass(n, p) / n
    best = None
    for feat, idx in (("x", 0), ("z", 1)):
        for t in sorted({d[idx] for d in data}):
            nl = sum(1 for d in data if d[idx] <= t)
            if nl == n:
                continue
            pl = sum(d[2] for d in data if d[idx] <= t)
            gain = root - (mass(nl, pl) + mass(n - nl, p - pl)) / n
            key = (-gain, feat, t)
            if best is None or key < best:
                best = key
    assert out["feature"] == best[1]
    assert out["split_x"] == best[2]
    assert out["gain"] == pytest.approx(-best[0], abs=1e-6)


# ---------------------------------------------------------------------------
# chi2_terms
# ---------------------------------------------------------------------------


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [Row(doc_id=i, lang=lang, text=text) for i, (lang, text) in enumerate(docs)]
    )


def test_chi2_planted_marker_term_ranks_first(spark):
    """'zebra' appears in every 'en' doc and no 'fr' doc -> it must be
    the top-ranked en term, and its chi2 must equal the hand formula."""
    from mcpvectordb_spark.operators.textstats import chi2_terms

    docs = [("en", f"zebra common{i % 3} filler") for i in range(10)] + [
        ("fr", f"cheval common{i % 3} filler") for i in range(10)
    ]
    out = chi2_terms(
        _docs_df(spark, docs), "lang", min_df=5, top_k=3
    ).collect()
    en = [r for r in out if r["cls"] == "en"]
    top = min(en, key=lambda r: r["rank"])
    assert top["term"] == "zebra"
    # hand 2x2: a=10 b=0 c=0 d=10, N=20 -> chi2 = 20*(100)^2/(10*10*10*10) = 20
    assert top["chi2"] == pytest.approx(20.0, abs=1e-9)
    # symmetric marker on the fr side
    fr_top = min(
        (r for r in out if r["cls"] == "fr"), key=lambda r: r["rank"]
    )
    assert fr_top["term"] == "cheval"


def test_chi2_single_class_returns_empty(spark):
    """Degenerate corpus: one class only -> the one-vs-rest contingency is
    undefined (n_c == N), and the operator returns zero rows rather than
    NULL/NaN scores."""
    from mcpvectordb_spark.operators.textstats import chi2_terms

    docs = [("en", f"word{i % 4} zebra text") for i in range(12)]
    assert chi2_terms(_docs_df(spark, docs), "lang", min_df=2).count() == 0


def test_chi2_min_df_filters_rare_terms(spark):
    from mcpvectordb_spark.operators.textstats import chi2_terms

    docs = [("en", "rareword" if i == 0 else "stuffing text") for i in range(6)] + [
        ("fr", "autre chose") for _ in range(6)
    ]
    out = chi2_terms(_docs_df(spark, docs), "lang", min_df=5, top_k=10).collect()
    assert all(r["term"] != "rareword" for r in out)


# ---------------------------------------------------------------------------
# lloyd_kmeans_replayable
# ---------------------------------------------------------------------------


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


def test_kmeans_separated_blobs_recover_planted_clusters(spark):
    """Two tight blobs far apart, k=2: after 2 Lloyd iterations every
    point must sit with its blob-mates and inertia must be tiny relative
    to the blob separation."""
    from mcpvectordb_spark.operators.knn import lloyd_kmeans_replayable

    dim = 4
    blob_a = [[0.0 + 0.01 * j] * dim for j in range(5)]
    blob_b = [[10.0 + 0.01 * j] * dim for j in range(5)]
    df = _emb_df(spark, blob_a + blob_b)
    out = lloyd_kmeans_replayable(df, "vec_id", "embedding", k=2, iters=2, dim=dim)
    rows = out.collect()
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r["cid"], set()).add(r["id"])
    assert sorted(len(v) for v in by_cid.values()) == [5, 5]
    assert {frozenset(v) for v in by_cid.values()} == {
        frozenset(range(5)),
        frozenset(range(5, 10)),
    }
    assert sum(r["dist2"] for r in rows) < 0.1


def test_kmeans_iterations_do_not_increase_inertia(spark):
    """Lloyd monotonicity (up to the 1e-9 centroid quantization): total
    inertia after 2 iterations <= after 0 iterations + epsilon."""
    from mcpvectordb_spark.operators.knn import lloyd_kmeans_replayable

    dim = 8
    vecs = [
        [((i * 37 + j * 11) % 97) / 97.0 for j in range(dim)] for i in range(40)
    ]
    df = _emb_df(spark, vecs)

    def inertia(iters):
        rows = lloyd_kmeans_replayable(
            df, "vec_id", "embedding", k=4, iters=iters, dim=dim
        ).collect()
        return sum(r["dist2"] for r in rows)

    assert inertia(2) <= inertia(0) + 1e-6


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """k == n with duplicate points: the duplicate seed's cluster empties
    (ties break to the lower cid) but the run still returns k-partition
    assignments without crashing, and every point keeps dist2 == 0."""
    from mcpvectordb_spark.operators.knn import lloyd_kmeans_replayable

    dim = 3
    vecs = [[1.0, 2.0, 3.0], [1.0, 2.0, 3.0], [5.0, 5.0, 5.0]]
    df = _emb_df(spark, vecs)
    rows = lloyd_kmeans_replayable(
        df, "vec_id", "embedding", k=3, iters=2, dim=dim
    ).collect()
    assert len(rows) == 3
    assert all(r["dist2"] == 0.0 for r in rows)
    # the two duplicates share the lower centroid id
    cids = {r["id"]: r["cid"] for r in rows}
    assert cids[0] == cids[1] == 0


def test_kmeans_deterministic_across_runs(spark):
    from mcpvectordb_spark.operators.knn import lloyd_kmeans_replayable

    dim = 6
    vecs = [
        [math.sin(i * 1.7 + j) for j in range(dim)] for i in range(30)
    ]
    df = _emb_df(spark, vecs)
    a = sorted(
        lloyd_kmeans_replayable(df, "vec_id", "embedding", k=3, iters=2, dim=dim)
        .collect(),
        key=lambda r: r["id"],
    )
    b = sorted(
        lloyd_kmeans_replayable(df, "vec_id", "embedding", k=3, iters=2, dim=dim)
        .collect(),
        key=lambda r: r["id"],
    )
    assert [(r["cid"], r["dist2"]) for r in a] == [(r["cid"], r["dist2"]) for r in b]


# ---------------------------------------------------------------------------
# invariance properties (the round-5 discipline: each new readout gets an
# algebraic invariance its algorithm must satisfy exactly)
# ---------------------------------------------------------------------------


def test_shapley_duplication_doubles_numerators_exactly(spark):
    """Replicating every journey under fresh user ids doubles every
    coalition value v(S), hence every EXACT numerator, bit-for-bit —
    linearity of the Shapley operator in the block counts."""
    from mcpvectordb_spark.operators.analytics import shapley_attribution

    channels = ["click", "signup", "view"]
    journeys = [
        (1, ["view", "click", "purchase"]),
        (2, ["view", "purchase"]),
        (3, ["click", "signup"]),
        (4, ["signup", "purchase"]),
    ]
    doubled = journeys + [(uid + 100, t) for uid, t in journeys]
    one = {
        r["channel"]: r["shapley_num"]
        for r in shapley_attribution(_events_df(spark, journeys), channels).collect()
    }
    two = {
        r["channel"]: r["shapley_num"]
        for r in shapley_attribution(_events_df(spark, doubled), channels).collect()
    }
    assert two == {c: 2 * n for c, n in one.items()}


def test_stump_label_complement_invariance(spark):
    """Gini impurity is symmetric in the two classes: flipping the label
    must leave the chosen (feature, split, gain) unchanged and complement
    the class counts."""
    from mcpvectordb_spark.operators.classify import gini_stump

    rows = [Row(x=i % 7, y=(i % 3 == 0)) for i in range(60)]
    df = spark.createDataFrame(rows)
    a = gini_stump(df, {"x": F.col("x")}, F.col("y")).collect()[0]
    b = gini_stump(df, {"x": F.col("x")}, ~F.col("y")).collect()[0]
    assert (a["feature"], a["split_x"]) == (b["feature"], b["split_x"])
    assert a["gain"] == b["gain"] and a["gini_root"] == b["gini_root"]
    assert b["pos_left"] == a["n_left"] - a["pos_left"]
    assert a["n_correct"] == b["n_correct"]


def test_chi2_binary_class_symmetry(spark):
    """With two classes the 2x2 chi-square is symmetric under swapping the
    class labels: every (term, score) pair must appear with identical chi2
    under the opposite class."""
    from mcpvectordb_spark.operators.textstats import chi2_terms

    docs = [("en", f"zebra w{i % 4} tail") for i in range(8)] + [
        ("fr", f"cheval w{i % 4} tail") for i in range(8)
    ]
    swapped = [("fr" if l == "en" else "en", t) for l, t in docs]
    a = {
        (r["cls"], r["term"]): r["chi2"]
        for r in chi2_terms(_docs_df(spark, docs), "lang", min_df=2, top_k=20).collect()
    }
    b = {
        (r["cls"], r["term"]): r["chi2"]
        for r in chi2_terms(
            _docs_df(spark, swapped), "lang", min_df=2, top_k=20
        ).collect()
    }
    assert a == {("fr" if c == "en" else "en", t): v for (c, t), v in b.items()}


def test_kmeans_dimension_permutation_invariance(spark):
    """Reversing every vector's dimensions permutes centroids identically,
    so assignments and per-point distances are EXACTLY unchanged (all
    arithmetic is elementwise; the fold order changes but each term is
    identical and summation of the reversed list hits the same total only
    up to ulps — so distances are compared at 1e-9)."""
    from mcpvectordb_spark.operators.knn import lloyd_kmeans_replayable

    dim = 6
    vecs = [[math.cos(i * 2.3 + j * 0.7) for j in range(dim)] for i in range(24)]
    rev = [list(reversed(v)) for v in vecs]
    a = {
        r["id"]: (r["cid"], r["dist2"])
        for r in lloyd_kmeans_replayable(
            _emb_df(spark, vecs), "vec_id", "embedding", k=3, iters=2, dim=dim
        ).collect()
    }
    b = {
        r["id"]: (r["cid"], r["dist2"])
        for r in lloyd_kmeans_replayable(
            _emb_df(spark, rev), "vec_id", "embedding", k=3, iters=2, dim=dim
        ).collect()
    }
    assert set(a) == set(b)
    for i in a:
        assert a[i][0] == b[i][0]
        assert a[i][1] == pytest.approx(b[i][1], abs=1e-9)


# ---------------------------------------------------------------------------
# silhouette_simplified
# ---------------------------------------------------------------------------


def test_silhouette_separated_blobs_near_one(spark):
    """Tight blobs far apart: every point's own-centroid distance is tiny
    vs the other centroid -> per-cluster silhouette > 0.99, and cluster
    sizes match the k-means partition."""
    from mcpvectordb_spark.operators.knn import silhouette_simplified

    dim = 4
    vecs = [[0.0 + 0.01 * j] * dim for j in range(5)] + [
        [10.0 + 0.01 * j] * dim for j in range(5)
    ]
    rows = silhouette_simplified(
        _emb_df(spark, vecs), "vec_id", "embedding", k=2, iters=2, dim=dim
    ).collect()
    assert sorted(r["n"] for r in rows) == [5, 5]
    assert all(r["silhouette"] > 0.99 for r in rows)


def test_silhouette_bounded_and_duplicate_centroids_score_zero(spark):
    """Silhouette is in [-1, 1] by construction; with k == n and two
    duplicate points the duplicate's a == b == 0 path must yield a
    DEFINITE 0-contribution (never a 0/0 NULL)."""
    from mcpvectordb_spark.operators.knn import silhouette_simplified

    vecs = [[1.0, 2.0], [1.0, 2.0], [5.0, 5.0]]
    rows = silhouette_simplified(
        _emb_df(spark, vecs), "vec_id", "embedding", k=3, iters=1, dim=2
    ).collect()
    for r in rows:
        assert r["silhouette"] is not None
        assert -1.0 <= r["silhouette"] <= 1.0
    # the duplicate pair lands on a centroid coincident with another ->
    # its cluster's mean silhouette is exactly 0
    by_n = {r["n"]: r["silhouette"] for r in rows}
    assert by_n[2] == 0.0


# ---------------------------------------------------------------------------
# power_mde
# ---------------------------------------------------------------------------


def test_power_mde_matches_closed_form(spark):
    """Hand-check against the textbook formula: recompute the pooled
    variance and (z_0.975+z_0.8)*se in Python from the same hash
    assignment and match to output rounding."""
    from mcpvectordb_spark.operators.stats import ab_assign, power_mde
    import hashlib

    rows = [Row(g="m", user_id=u, v=(u * 13) % 40) for u in range(400)]
    df = spark.createDataFrame(rows)
    out = power_mde(df, "g", "user_id", F.col("v"), salt="fdr").collect()[0]

    def arm(u):
        return int(hashlib.md5(f"fdr:{u}".encode()).hexdigest()[:12], 16) % 2

    vals = {0: [], 1: []}
    for u in range(400):
        vals[arm(u)].append((u * 13) % 40)
    n0, n1 = len(vals[0]), len(vals[1])

    def var(xs):
        n = len(xs)
        s, ss = sum(xs), sum(x * x for x in xs)
        return (n * ss - s * s) / (n * (n - 1.0))

    var_p = ((n0 - 1) * var(vals[0]) + (n1 - 1) * var(vals[1])) / (n0 + n1 - 2.0)
    mde = 2.801585219 * math.sqrt(var_p * (1 / n0 + 1 / n1))
    assert out["n_a"] == n0 and out["n_b"] == n1
    assert out["mde_abs"] == pytest.approx(mde, abs=1e-3)
    mean = sum(vals[0] + vals[1]) / 400.0
    assert out["mde_rel"] == pytest.approx(mde / mean, abs=1e-5)


def test_power_mde_shrinks_with_sample_size(spark):
    """Quadrupling n halves the MDE (1/sqrt(n) law) for the same value
    distribution."""
    from mcpvectordb_spark.operators.stats import power_mde

    def mde(n):
        df = spark.createDataFrame([Row(g="m", user_id=u, v=u % 10) for u in range(n)])
        return power_mde(df, "g", "user_id", F.col("v")).collect()[0]["mde_abs"]

    small, large = mde(500), mde(2000)
    assert large == pytest.approx(small / 2, rel=0.1)


def test_power_mde_degenerate_groups_null_not_crash(spark):
    """Constant values (zero variance) and a single-user group emit NULL
    mde columns — numeric not-evaluable — without an ANSI division or
    sqrt error."""
    from mcpvectordb_spark.operators.stats import power_mde

    rows = [Row(g="const", user_id=u, v=7) for u in range(50)] + [
        Row(g="solo", user_id=1, v=3)
    ]
    out = {r["g"]: r for r in power_mde(
        spark.createDataFrame(rows), "g", "user_id", F.col("v")
    ).collect()}
    assert out["const"]["mde_abs"] is None and out["const"]["sd_v"] is None
    assert out["solo"]["mde_abs"] is None
    assert out["const"]["mean_v"] == 7.0


# ---------------------------------------------------------------------------
# sources_overlap (catalog composition — runs the real query on tmp parquet)
# ---------------------------------------------------------------------------


def _write_docs(spark, tmp_path, docs):
    df = spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source=s, n_chars=len(t))
            for i, (s, t) in enumerate(docs)
        ]
    )
    df.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_sources_overlap_planted_counts_exact(spark, tmp_path):
    """Source A and B share exactly the shingles of one common sentence;
    each also has a private sentence.  The intersection / union counts
    are hand-computable from the 3-gram definition."""
    from mcpvectordb_spark.catalog import q_sources_overlap

    common = "alpha beta gamma delta"        # 2 distinct 3-grams
    pa = "one two three four five"           # 3 distinct 3-grams
    pb = "six seven eight nine"               # 2 distinct 3-grams
    d = _write_docs(
        spark,
        tmp_path,
        [("A", common), ("A", pa), ("B", common), ("B", pb)],
    )
    rows = q_sources_overlap(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["sa"], r["sb"]) == ("A", "B")
    assert r["n_inter"] == 2 and r["na"] == 5 and r["nb"] == 4
    assert r["jaccard"] == round(2 / (5 + 4 - 2), 6)
    assert r["containment"] == round(2 / 4, 6)


def test_sources_overlap_disjoint_sources_emit_no_row(spark, tmp_path):
    from mcpvectordb_spark.catalog import q_sources_overlap

    d = _write_docs(
        spark,
        tmp_path,
        [("A", "one two three four"), ("B", "five six seven eight")],
    )
    assert q_sources_overlap(spark, d).count() == 0


def test_sources_overlap_single_source_empty(spark, tmp_path):
    from mcpvectordb_spark.catalog import q_sources_overlap

    d = _write_docs(spark, tmp_path, [("A", "one two three four five six")])
    assert q_sources_overlap(spark, d).count() == 0


# ---------------------------------------------------------------------------
# parts_abc (catalog composition — runs the real query on tmp parquet)
# ---------------------------------------------------------------------------


def _write_lineitem(spark, tmp_path, rows):
    """rows: list of (partkey, price_dollars)."""
    df = spark.createDataFrame(
        [
            Row(l_partkey=p, l_extendedprice=float(v), l_discount=0.0)
            for p, v in rows
        ]
    )
    df.coalesce(2).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    return str(tmp_path)


def test_parts_abc_planted_pareto(spark, tmp_path):
    """One whale part holds 80% of revenue exactly, one mid part the next
    15%, three tail parts the rest: the value-based cuts must classify
    them A / B / C with exact shares."""
    from mcpvectordb_spark.catalog import q_parts_abc

    rows = [(1, 800.0), (2, 150.0), (3, 20.0), (4, 20.0), (5, 10.0)]
    d = _write_lineitem(spark, tmp_path, rows)
    out = {r["abc_class"]: r for r in q_parts_abc(spark, d).collect()}
    assert out["A"]["n_parts"] == 1 and out["A"]["revenue_dollars"] == 800.0
    assert out["B"]["n_parts"] == 1 and out["B"]["revenue_dollars"] == 150.0
    assert out["C"]["n_parts"] == 3 and out["C"]["revenue_dollars"] == 50.0
    assert out["A"]["revenue_share"] == 0.8
    assert out["B"]["revenue_share"] == 0.15
    assert out["C"]["revenue_share"] == 0.05


def test_parts_abc_constant_revenue_all_A_definite(spark, tmp_path):
    """Degenerate corpus: every part has identical revenue — the first
    (only) block crosses both cuts, so everything is class A and the
    readout is one definite row."""
    from mcpvectordb_spark.catalog import q_parts_abc

    d = _write_lineitem(spark, tmp_path, [(p, 100.0) for p in range(1, 9)])
    rows = q_parts_abc(spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["abc_class"] == "A"
    assert rows[0]["n_parts"] == 8
    assert rows[0]["revenue_share"] == 1.0


def test_parts_abc_scale_invariance(spark, tmp_path):
    """Multiplying every price by 10 leaves classes, part counts, and
    shares unchanged (the cuts are proportional)."""
    from mcpvectordb_spark.catalog import q_parts_abc

    rows = [(p, float(((p * 37) % 90) + 10)) for p in range(1, 40)]
    a_dir = _write_lineitem(spark, tmp_path / "a", rows)
    b_dir = _write_lineitem(
        spark, tmp_path / "b", [(p, v * 10) for p, v in rows]
    )
    a = {(r["abc_class"]): (r["n_parts"], r["revenue_share"])
         for r in q_parts_abc(spark, a_dir).collect()}
    b = {(r["abc_class"]): (r["n_parts"], r["revenue_share"])
         for r in q_parts_abc(spark, b_dir).collect()}
    assert a == b
