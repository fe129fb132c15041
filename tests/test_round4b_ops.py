"""Unit tests for the round-4b operator cohort: AllPairs set-similarity
join, TextRank summarization, item-item CF, 2-D skyline, BFS, trailing
EWMA, and the key-skew report.  Each test pins the operator against a
hand-computable small input (the catalog oracle gates cover the
corpus-scale behavior)."""

import math

import pytest
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.analytics import item_item_cosine
from mcpvectordb_spark.operators.graph import bfs_distances
from mcpvectordb_spark.operators.simjoin import jaccard_ssjoin
from mcpvectordb_spark.operators.skew import skew_report
from mcpvectordb_spark.operators.skyline import skyline2d
from mcpvectordb_spark.operators.textrank import textrank_sentences
from mcpvectordb_spark.operators.timeseries import ewma_trailing


def test_jaccard_ssjoin_matches_bruteforce(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again today"),
        (3, "completely different words about spark shuffles and partitions here"),
        (4, "completely different words about spark shuffles and partitions here"),
    ]
    df = spark.createDataFrame(docs, ["id", "text"])
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in jaccard_ssjoin(df, "id", "text", threshold=0.5).collect()
    }
    # brute force over 3-shingles
    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    expect = {}
    for i, (ia, ta) in enumerate(docs):
        for ib, tb in docs[i + 1 :]:
            a, b = sh(ta), sh(tb)
            j = len(a & b) / len(a | b)
            if j >= 0.5:
                expect[(ia, ib)] = round(j, 6)
    assert got == expect
    assert (3, 4) in got and got[(3, 4)] == 1.0


def test_jaccard_ssjoin_threshold_excludes(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "u v w x y z")], ["id", "text"]
    )
    assert jaccard_ssjoin(df, "id", "text", threshold=0.2).count() == 0


def test_textrank_picks_connected_sentence(spark):
    # s1/s2 share words (central); s3 is isolated -> lowest rank
    text = "spark runs fast queries. fast queries need spark. bananas are yellow."
    df = spark.createDataFrame([(1, text)], ["doc", "text"])
    out = textrank_sentences(df, "doc", "text", top_k=3, iters=5)
    rows = {r["sent"]: r["rank"] for r in out.collect()}
    assert len(rows) == 3
    iso = rows["bananas are yellow."]  # last segment keeps its final period
    assert all(iso <= v for v in rows.values())
    assert math.isclose(iso, 0.15, rel_tol=1e-9)  # no inflow -> 1-d


def test_textrank_top_k_bound(spark):
    df = spark.createDataFrame(
        [(1, "a b. b c. c a. d e. e f.")], ["doc", "text"]
    )
    assert textrank_sentences(df, "doc", "text", top_k=2).count() == 2


def test_item_item_cosine_hand_example(spark):
    baskets = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(baskets, ["bk", "it"])
    got = {
        (r["item_a"], r["item_b"]): (r["cooc"], round(r["cos"], 6))
        for r in item_item_cosine(df, "bk", "it", min_cooc=2).collect()
    }
    # cooc(a,b)=2, n_a=3, n_b=2 -> cos = 2/sqrt(6)
    assert got == {("a", "b"): (2, round(2 / math.sqrt(6), 6))}


def test_item_item_max_basket_drops_whole_basket(spark):
    rows = [(1, "a"), (1, "b")] + [(2, f"x{i}") for i in range(5)] + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, ["bk", "it"])
    out = item_item_cosine(df, "bk", "it", min_cooc=2, max_basket=3)
    # basket 2 (7 items) dropped -> cooc(a,b)=1 < 2 -> empty
    assert out.count() == 0


def test_skyline2d_hand_example(spark):
    pts = [(1, 10, 5), (2, 10, 7), (3, 20, 7), (4, 5, 1), (5, 30, 9)]
    df = spark.createDataFrame(pts, ["id", "cost", "gain"])
    got = sorted(r["id"] for r in skyline2d(df, "cost", "gain").collect())
    # 1 dominated by 2 (same cost, more gain); 3 dominated by 2 (cheaper, same gain)
    assert got == [2, 4, 5]


def test_skyline2d_keeps_exact_duplicates(spark):
    df = spark.createDataFrame([(1, 10, 5), (2, 10, 5)], ["id", "cost", "gain"])
    assert skyline2d(df, "cost", "gain").count() == 2


def test_bfs_distances_chain(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (9, 10)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r["node"]: r["d"] for r in bfs_distances(edges, seeds, max_depth=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # 4 beyond depth, 9/10 unreachable


def test_bfs_multi_source_min_distance(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 3)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,), (4,)], ["node"])
    got = {r["node"]: r["d"] for r in bfs_distances(edges, seeds, max_depth=3).collect()}
    assert got == {1: 0, 4: 0, 2: 1, 3: 1}


def test_ewma_trailing_hand_example(spark):
    series = spark.createDataFrame(
        [("k", 0, 10.0), ("k", 1, 20.0), ("k", 2, 30.0)], ["g", "t", "x"]
    )
    out = {r["t"]: r["ewma"] for r in ewma_trailing(series, "g", "t", "x", alpha=0.5, window=24).collect()}
    assert math.isclose(out[0], 10.0, rel_tol=1e-9)
    assert math.isclose(out[1], (20.0 + 0.5 * 10.0) / 1.5, rel_tol=1e-9)
    assert math.isclose(out[2], (30.0 + 0.5 * 20.0 + 0.25 * 10.0) / 1.75, rel_tol=1e-9)


def test_ewma_trailing_window_cuts_and_gaps(spark):
    # gap: missing t=1 contributes neither weight nor value; window=2 drops t=0 at t=2
    series = spark.createDataFrame([("k", 0, 10.0), ("k", 2, 30.0)], ["g", "t", "x"])
    out = {r["t"]: r["ewma"] for r in ewma_trailing(series, "g", "t", "x", alpha=0.5, window=2).collect()}
    assert math.isclose(out[2], 30.0, rel_tol=1e-9)  # t=0 outside (0, 2] - window


def test_ewma_crosses_block_boundary(spark):
    # window=4: t=5 must still see t=3 (different t div 4 blocks)
    series = spark.createDataFrame(
        [("k", 3, 8.0), ("k", 5, 16.0)], ["g", "t", "x"]
    )
    out = {r["t"]: r["ewma"] for r in ewma_trailing(series, "g", "t", "x", alpha=0.5, window=4).collect()}
    assert math.isclose(out[5], (16.0 + 0.25 * 8.0) / 1.25, rel_tol=1e-9)


def test_skew_report_shares_and_gini(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, ["k"]
    )
    rows = {r["key"]: r for r in skew_report(df, "k", top_k=2).collect()}
    assert set(rows) == {"a", "b"}
    assert math.isclose(rows["a"]["share"], 0.6, rel_tol=1e-9)
    assert math.isclose(rows["a"]["cum_share"], 0.6, rel_tol=1e-9)
    assert math.isclose(rows["b"]["cum_share"], 0.9, rel_tol=1e-9)
    # ascending counts (1,3,6): gini = (2*(1*1+2*3+3*6)-4*10)/(3*10) = 1/3
    assert math.isclose(rows["a"]["gini"], 1 / 3, rel_tol=1e-9)


def test_hits_bipartite_hand_example(spark):
    # s1 -> {a, b}; s2 -> {b}.  b has two in-hubs -> strongest authority
    edges = spark.createDataFrame(
        [("s1", "a"), ("s1", "b"), ("s2", "b")], ["src", "dst"]
    )
    from mcpvectordb_spark.operators.graph import hits_scores

    got = {r["node"]: r["auth"] for r in hits_scores(edges, iters=4).collect()}
    assert got["b"] > got["a"]
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)  # L1 normalized


def test_label_propagation_two_cliques(spark):
    # two triangles joined by one weak bridge -> two communities led by
    # each clique's minimum label
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    from mcpvectordb_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(tri1 + tri2 + bridge, ["src", "dst"])
    got = {r["node"]: r["lbl"] for r in label_propagation(edges, rounds=4).collect()}
    assert got[1] == got[2] == got[3] == 1
    # labels can leak over the bridge (10's label becomes 3 via min-label
    # ties) but the clique must stay one community, distinct from tri1's
    assert got[10] == got[11] == got[12]
    assert got[10] != got[1]


def test_theilsen_ignores_outlier(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for h in range(9):
        n = 1000 if h == 4 else 10 + 2 * h  # clean slope 2, one wild hour
        for i in range(n):
            rows.append((h * 1000 + i, base + datetime.timedelta(hours=h), 1, "x", 0.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.createOrReplaceTempView("__ts_ev")
    from pyspark.sql import functions as F
    hourly = df.groupBy(
        "event_type", F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    a = hourly.select("event_type", F.col("h").alias("h1"), F.col("n").alias("n1"))
    b = hourly.select("event_type", F.col("h").alias("h2"), F.col("n").alias("n2"))
    slopes = a.join(b, "event_type").filter(F.col("h1") < F.col("h2")).select(
        ((F.col("n2") - F.col("n1")) / (F.col("h2") - F.col("h1"))).alias("slope")
    )
    med = slopes.agg(F.percentile("slope", F.lit(0.5)).alias("m")).first()["m"]
    assert abs(med - 2.0) < 0.75  # OLS slope would be pulled ~ +100


def test_ivm_matches_full_recompute(spark):
    from mcpvectordb_spark.operators.ivm import incremental_join_delta

    a = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(40)], ["apk", "jk", "av"]
    )
    b = spark.createDataFrame([(k, f"b{k}") for k in range(5)], ["bk", "bv"])
    da = a.filter(F.col("apk") % 7 == 0)
    ia = da.withColumn("av", F.col("av") + 100.0)
    db = b.filter(F.col("bk") == 2)
    ib = db.withColumn("bv", F.concat("bv", F.lit("!")))

    got = incremental_join_delta(a, ia, da, b, ib, db, "jk", "bk", "apk", "bk")
    g_ins = {tuple(r) for r in got.filter("op='ins'").drop("op").collect()}
    g_del = {tuple(r) for r in got.filter("op='del'").drop("op").collect()}

    cond = F.col("jk") == F.col("bk")
    v = a.join(b, cond)
    a2 = a.join(da.select("apk"), "apk", "left_anti").unionByName(ia)
    b2 = b.join(db.select("bk"), "bk", "left_anti").unionByName(ib)
    v2 = a2.join(b2, cond)
    e_ins = {tuple(r) for r in v2.exceptAll(v).collect()}
    e_del = {tuple(r) for r in v.exceptAll(v2).collect()}
    assert g_ins == e_ins and g_del == e_del
    assert g_ins and g_del  # the increment is non-trivial


def test_ivm_untouched_rows_absent(spark):
    from mcpvectordb_spark.operators.ivm import incremental_join_delta

    a = spark.createDataFrame([(1, 10, 1.0), (2, 20, 2.0)], ["apk", "jk", "av"])
    b = spark.createDataFrame([(10, "x"), (20, "y")], ["bk", "bv"])
    empty_a, empty_b = a.limit(0), b.limit(0)
    da = a.filter("apk = 1")
    ia = da.withColumn("av", F.lit(9.0))
    out = incremental_join_delta(a, ia, da, b, empty_b, empty_b, "jk", "bk", "apk", "bk")
    rows = {(r["op"], r["apk"]) for r in out.collect()}
    # row 2 shares nothing with the delta and must not appear
    assert rows == {("ins", 1), ("del", 1)}


def test_ewma_recursive_fold_matches_python(spark):
    from mcpvectordb_spark.catalog import q_events_ewma_recursive  # noqa: F401
    # exercise the same fold shape directly on a tiny frame
    df = spark.createDataFrame(
        [("k", 0, 10.0), ("k", 1, 20.0), ("k", 2, 40.0)], ["g", "h", "n"]
    )
    arr = df.groupBy("g").agg(
        F.array_sort(F.collect_list(F.struct("h", "n"))).alias("xs")
    )
    fold = F.aggregate(
        F.col("xs"), F.array().cast("array<double>"),
        lambda acc, e: F.when(F.size(acc) == 0, F.array(e["n"])).otherwise(
            F.concat(acc, F.array(F.lit(0.3) * e["n"] + F.lit(0.7) * F.element_at(acc, -1)))
        ),
    )
    got = arr.select(fold.alias("sm")).first()["sm"]
    s = [10.0]
    for x in (20.0, 40.0):
        s.append(0.3 * x + 0.7 * s[-1])
    assert all(math.isclose(a, b, rel_tol=1e-12) for a, b in zip(got, s))


def test_agg_ivm_matches_recompute(spark):
    from mcpvectordb_spark.operators.ivm import base_agg_view, incremental_agg_delta

    a = spark.createDataFrame(
        [(i, i % 4, float(i) + 0.5) for i in range(30)], ["pk", "k", "v"]
    )
    dels = a.filter(F.col("pk") % 5 == 0)                       # updates
    ins = dels.withColumn("v", F.col("v") * 2).unionByName(      # + brand-new key
        spark.createDataFrame([(100, 9, 7.0)], ["pk", "k", "v"])
    )
    view = base_agg_view(a, ["k"], ["v"])
    got = {
        r["k"]: (r["__cnt"], round(r["sum_v"], 9))
        for r in incremental_agg_delta(view, ins, dels, ["k"], ["v"]).collect()
    }
    a2 = a.join(dels.select("pk"), "pk", "left_anti").unionByName(ins)
    touched = {r["k"] for r in dels.select("k").union(ins.select("k")).distinct().collect()}
    expect = {
        r["k"]: (r["__cnt"], round(r["sum_v"], 9))
        for r in base_agg_view(a2, ["k"], ["v"]).collect()
        if r["k"] in touched
    }
    assert got == expect and 9 in got  # includes the brand-new key


def test_agg_ivm_vanished_key_omitted(spark):
    from mcpvectordb_spark.operators.ivm import base_agg_view, incremental_agg_delta

    a = spark.createDataFrame([(1, "x", 1.0), (2, "y", 2.0)], ["pk", "k", "v"])
    dels = a.filter("k = 'x'")
    ins = dels.limit(0)
    view = base_agg_view(a, ["k"], ["v"])
    out = incremental_agg_delta(view, ins, dels, ["k"], ["v"]).collect()
    assert out == []  # x vanished (cnt 0), y untouched -> not emitted


def test_kcore_peels_tail(spark):
    from mcpvectordb_spark.operators.graph import kcore

    # triangle (3-core needs k=2 here) + a pendant chain that must peel off
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    got = {r["node"]: r["deg"] for r in kcore(edges, k=2, rounds=4).collect()}
    assert got == {1: 2, 2: 2, 3: 2}  # 5 peels first, then 4


def test_kcore_cascading_rounds(spark):
    from mcpvectordb_spark.operators.graph import kcore

    # a long chain: each round peels both endpoints; 4 rounds clear <=8 nodes
    chain = [(i, i + 1) for i in range(1, 8)]
    got = kcore(spark.createDataFrame(chain, ["src", "dst"]), k=2, rounds=4).count()
    assert got == 0
