"""Graph + recommendation insights over the order stream — the third
example pipeline, composing the round-4 graph/recs operators the way a
merchandising team would run them nightly.  The co-purchase edge list is
mined ONCE (localCheckpoint) and shared by every graph stage — the reuse
pattern that matters at 100 TB, where the pair-mining join dominates.

    lineitem ─ co-purchase edges (>=2 co-orders, pinned) ─┬─ communities (LP)
                                                          ├─ PageRank hubs
                                                          ├─ triangle census
                                                          └─ 3-core density
    lineitem ─ supplier→part graph ──────────────────────── PPR recs (seeded)
    lineitem ─ baskets ──────────────────────────────────── item-item CF recs
    part     ─ (price, size) ────────────────────────────── skyline value picks

Prints one JSON line; the smoke test asserts cross-stage invariants
(community count vs node count, CF/PPR rec overlap shape, skyline
non-domination).

Run: python examples/graph_insights_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mcpvectordb_spark.io import load_table
from mcpvectordb_spark.operators.analytics import item_item_cosine
from mcpvectordb_spark.operators.graph import (
    kcore,
    label_propagation,
    modularity,
    pagerank,
    triangle_count,
)
from mcpvectordb_spark.operators.skyline import skyline2d
from mcpvectordb_spark.session import get_spark


def main(sf_dir: str, stop_session: bool = True) -> dict:
    spark = get_spark("graph-insights")
    out: dict = {}

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"), "w")
        .localCheckpoint()  # mined once, read by four graph stages
    )
    out["edges"] = edges.count()

    # 1. communities over the pinned edges, scored by exact modularity
    labels = label_propagation(edges, rounds=4).localCheckpoint()
    out["nodes"] = labels.count()
    out["communities"] = labels.select("lbl").distinct().count()
    q = modularity(edges, labels).collect()[0]
    out["modularity"] = round(q["modularity"], 6)

    # 2. hub parts by weighted PageRank (symmetrized, small-graph pins)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    pr = pagerank(sym, iterations=6, weight_col="w", loop_partitions=8)
    out["top_hubs"] = [
        r["node"] for r in pr.orderBy(F.desc("rank"), "node").limit(5).collect()
    ]

    # 3. structure census
    tri = triangle_count(edges).first()
    out["triangles"] = {
        "n_nodes": tri["n_nodes"], "n_edges": tri["n_edges"],
        "n_triangles": tri["n_triangles"],
    }

    # 4. dense trading core
    out["core3_nodes"] = kcore(edges, k=3, rounds=4).count()

    # 5. PPR recommendations from seed suppliers (namespaced negative)
    sp = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy((-F.col("l_suppkey")).alias("src"), F.col("l_partkey").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= 2)
    )
    bip = sp.select("src", "dst", "n").unionByName(
        sp.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "n")
    )
    seeds = spark.range(1, 5).select((-F.col("id")).alias("node"))
    ppr = pagerank(bip, iterations=6, weight_col="n", loop_partitions=8, teleport=seeds)
    out["ppr_recs"] = [
        r["node"]
        for r in ppr.filter(F.col("node") > 0)
        .orderBy(F.desc("rank"), "node").limit(5).collect()
    ]

    # 6. co-occurrence CF recommendations for the most popular part
    cf = item_item_cosine(li, "l_orderkey", "l_partkey", min_cooc=2)
    top_part = (
        li.groupBy("l_partkey").count().orderBy(F.desc("count"), "l_partkey").first()
    )["l_partkey"]
    sym_cf = cf.select(
        F.col("item_a").alias("seed"), F.col("item_b").alias("rec"), "cos"
    ).unionByName(
        cf.select(F.col("item_b").alias("seed"), F.col("item_a").alias("rec"), "cos")
    )
    out["cf_seed"] = int(top_part)
    out["cf_recs"] = [
        r["rec"]
        for r in sym_cf.filter(F.col("seed") == top_part)
        .orderBy(F.desc("cos"), "rec").limit(5).collect()
    ]

    # 7. skyline value picks: cheapest-per-size frontier
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("price_c"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    sky = skyline2d(p, "price_c", "p_size")
    out["skyline"] = [
        [r["p_partkey"], r["price_c"], r["p_size"]]
        for r in sky.orderBy("price_c", "p_partkey").collect()
    ]

    print(json.dumps(out))
    if stop_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
