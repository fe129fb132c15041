"""Smoke + invariants for examples/graph_insights_pipeline.py."""

import sys

sys.path.insert(0, ".")


def test_graph_insights_pipeline_invariants(spark):
    from examples.graph_insights_pipeline import main

    out = main("/root/testdata/sf0.001", stop_session=False)

    # community structure: at least one community, no more than nodes
    assert 1 <= out["communities"] <= out["nodes"]
    # modularity of the LP labeling is a bounded quality score
    assert -1.0 <= out["modularity"] <= 1.0
    # census consistency with the shared edge list
    assert out["triangles"]["n_edges"] == out["edges"]
    assert out["triangles"]["n_nodes"] == out["nodes"]
    # the 3-core is a subgraph
    assert 0 <= out["core3_nodes"] <= out["nodes"]
    # both recommenders return part ids (positive after namespacing)
    assert all(n > 0 for n in out["ppr_recs"])
    assert out["cf_seed"] > 0
    # skyline: strictly increasing size along increasing price (canonical
    # 2-D frontier shape once dominated points are gone; ties allowed on
    # neither axis after per-axis dedup)
    sky = out["skyline"]
    assert len(sky) >= 1
    for (pk1, c1, s1), (pk2, c2, s2) in zip(sky, sky[1:]):
        assert c2 >= c1
        if c2 > c1:
            assert s2 > s1  # pricier frontier points must offer more size
