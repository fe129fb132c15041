"""Round-4 operators: time-series resample/interpolate, SCD2, winnowing
fingerprints, last-touch attribution, triangle counting, logistic-GD."""

import math

from pyspark.sql import functions as F


def test_resample_interpolate_exact_values(spark):
    from mcpvectordb_spark.operators.timeseries import resample_interpolate

    # sensor A: observed at buckets 0, 3, 4 (step=10): holes at 1, 2
    rows = [
        ("a", 5, 10.0), ("a", 7, 20.0),          # bucket 0 -> avg 15
        ("a", 35, 45.0),                          # bucket 3
        ("a", 41, 100.0),                         # bucket 4
        ("b", 12, 7.0),                           # single point
    ]
    df = spark.createDataFrame(rows, "k string, sec long, v double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "v"
    )
    out = resample_interpolate(df, F.col("k"), "ts", "v", step_s=10)
    got = {(r["k"], r["bucket"]): (r["observed"], r["v_filled"]) for r in out.collect()}
    assert got[("a", 0)] == (True, 15.0)
    # linear between 15 (bucket 0) and 45 (bucket 30): 1/3 and 2/3 points
    assert got[("a", 10)] == (False, 25.0)
    assert got[("a", 20)] == (False, 35.0)
    assert got[("a", 30)] == (True, 45.0)
    assert got[("a", 40)] == (True, 100.0)
    assert got[("b", 10)] == (True, 7.0)
    assert len(got) == 6  # grid spans each key's own [min, max] only


def test_resample_interpolate_edge_extrapolation(spark):
    from mcpvectordb_spark.operators.timeseries import resample_interpolate

    # grid spans min..max of OBSERVED buckets; interior holes before the
    # first/after the last observation cannot exist, but a key whose series
    # starts with nulls after a left-join against a wider grid would take
    # the nearest-neighbour branch; prove the branch with a 3-bucket series
    # whose middle is missing and ends observed
    df = spark.createDataFrame(
        [("x", 0, 2.0), ("x", 20, 8.0)], "k string, sec long, v double"
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "v")
    out = resample_interpolate(df, F.col("k"), "ts", "v", step_s=10).collect()
    mid = [r for r in out if r["bucket"] == 10][0]
    assert not mid["observed"] and abs(mid["v_filled"] - 5.0) < 1e-12


def test_scd2_history_intervals(spark):
    from mcpvectordb_spark.operators.timeseries import scd2_history

    rows = [
        (1, "A", 10, 100), (1, "A", 20, 101), (1, "B", 30, 102), (1, "A", 40, 103),
        (2, "C", 15, 200),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, sec long, tb long").select(
        "k", "attr", F.timestamp_seconds("sec").alias("ts"), "tb"
    )
    out = scd2_history(df, "k", "attr", "ts", "tb")
    got = sorted(
        (r["key"], r["attr"], r["valid_from"].second + r["valid_from"].minute * 60,
         None if r["valid_to"] is None else r["valid_to"].second + r["valid_to"].minute * 60,
         r["is_current"])
        for r in out.collect()
    )
    assert got == [
        (1, "A", 10, 30, False),   # repeat at 20 collapses into the first interval
        (1, "A", 40, None, True),
        (1, "B", 30, 40, False),
        (2, "C", 15, None, True),
    ]


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's defining property: two docs sharing a substring of
    length >= k + w - 1 share at least one selected fingerprint hash."""
    from mcpvectordb_spark.operators.textstats import winnowing_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, "prefix one %s suffix alpha" % shared),
            (2, "completely different lead-in %s and another tail" % shared),
            (3, "no overlap here at all just words and more words padding"),
        ],
        "id long, text string",
    )
    fp = winnowing_fingerprints(docs, "id", "text", k=8, w=4)
    by_doc = {
        i: {r["h40"] for r in rows}
        for i, rows in ((i, [r for r in fp.collect() if r["id"] == i]) for i in (1, 2, 3))
    }
    assert by_doc[1] & by_doc[2], "shared 44-char substring must share a fingerprint"
    # density sanity: ~2/(w+1) of positions selected, not all of them
    n1 = len(by_doc[1])
    assert 0 < n1 < 60


def test_winnowing_rightmost_min_determinism(spark):
    from mcpvectordb_spark.operators.textstats import winnowing_fingerprints

    docs = spark.createDataFrame([(1, "abcabcabcabcabcabc")], "id long, text string")
    a = sorted(map(tuple, winnowing_fingerprints(docs, "id", "text", k=4, w=3).collect()))
    b = sorted(map(tuple, winnowing_fingerprints(docs, "id", "text", k=4, w=3).collect()))
    assert a == b and len(a) > 0
    # positions are valid k-gram starts
    assert all(1 <= p <= 15 for (_, p, _) in a)


def test_last_touch_attribution(spark):
    from mcpvectordb_spark.operators.analytics import last_touch_attribution

    rows = [
        (1, 1, 100, "view", 0.0),
        (1, 2, 200, "click", 0.0),
        (1, 3, 300, "purchase", 10.0),   # last touch = click
        (1, 4, 400, "purchase", 5.0),    # touches skip the purchase at 300 -> click
        (2, 5, 100, "purchase", 7.0),    # no prior touch -> direct
        (3, 6, 100, "view", 0.0),
        (3, 7, 100 + 8 * 86400, "purchase", 3.0),  # touch outside 7d -> direct
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, sec long, event_type string, value double"
    ).select("user_id", "event_id", F.timestamp_seconds("sec").alias("ts"),
             "event_type", "value")
    out = {r["conv_id"]: r["channel"] for r in last_touch_attribution(df, "purchase").collect()}
    assert out == {3: "click", 4: "click", 5: "direct", 7: "direct"}


def test_triangle_count_exact(spark):
    from mcpvectordb_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles) + pendant 5 + disconnected edge 6-7,
    # with duplicate/reversed edges that must canonicalize away
    edges = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7), (6, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = triangle_count(df).first()
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (7, 8, 4)
    # wedges: K4 contributes C(3,2)*4=12, node4 extra via pendant: deg(4)=4 -> C(4,2)=6
    # degrees: 1:3, 2:3, 3:3, 4:4, 5:1, 6:1, 7:1 -> 3+3+3+6+0+0+0 = 15
    assert r["n_wedges"] == 15


def test_logistic_gd_learns_and_matches_numpy(spark):
    import numpy as np

    from mcpvectordb_spark.operators.mlr import (
        score_logistic,
        standardized_features,
        train_logistic_gd,
    )

    # linearly separable-ish toy: y = 1 when a + b > 10
    rows = [(float(i % 11), float((i * 7) % 13), 1.0 if (i % 11) + ((i * 7) % 13) > 10 else 0.0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "a double, b double, y double")
    feats = standardized_features(df, [F.col("a"), F.col("b")], F.col("y"))
    w = train_logistic_gd(feats, 2, iterations=20, lr=0.5)

    # replay in numpy on the same standardized features
    X = np.array([[r["x1"], r["x2"]] for r in feats.collect()])
    Y = np.array([r["y"] for r in feats.collect()])
    wn = np.zeros(3)
    for _ in range(20):
        z = wn[0] + X @ wn[1:]
        e = 1.0 / (1.0 + np.exp(-z)) - Y
        wn = wn - 0.5 * np.array([e.mean(), (e * X[:, 0]).mean(), (e * X[:, 1]).mean()])
    assert np.allclose(w, wn, atol=1e-9)

    scored = score_logistic(feats, w)
    acc = scored.agg(F.avg((F.col("pred") == F.col("y")).cast("double"))).first()[0]
    assert acc > 0.85  # the model genuinely learns the boundary


def _topic_corpus(spark):
    a = "stellar galaxy nebula cosmos orbit photon quasar telescope"
    b = "harvest tractor orchard meadow barley furrow pasture silo"
    rows = []
    for i in range(30):
        w = (a if i % 2 == 0 else b).split()
        rows.append((i, " ".join(w[i % 4:] + w[: i % 4])))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_w2v_vectors_carry_topic_semantics(spark):
    """PMI+SVD vectors are TRAINED: same-topic docs embed closer than
    cross-topic docs (the property the untrained MiniTransformer cannot
    have)."""
    import numpy as np

    from mcpvectordb_spark.operators.w2v import embed_documents_df, train_word_vectors

    docs = _topic_corpus(spark)
    wv = train_word_vectors(docs, "doc_id", "text", dim=8, vocab_size=50, window=2)
    emb = {r["id"]: np.array(r["embedding"]) for r in
           embed_documents_df(docs, "doc_id", "text", wv, 8).collect()}
    same = np.dot(emb[0], emb[2])       # topic A vs topic A
    cross = np.dot(emb[0], emb[1])      # topic A vs topic B
    assert same > cross + 0.3, (same, cross)


def test_w2v_embedder_protocol_contract(spark):
    import numpy as np

    from mcpvectordb_spark.embedder import PmiSvdEmbedder

    docs = _topic_corpus(spark)
    e = PmiSvdEmbedder.fit(docs, "doc_id", "text", dim=8, vocab_size=50)
    out = e.embed_documents(["stellar galaxy nebula", "tractor orchard barley"])
    assert out.shape == (2, 8) and out.dtype == np.float32
    # L2 contract
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    q = e.embed_query("galaxy telescope photon")
    assert q.shape == (8,)
    # trained semantics survive the protocol wrapper
    assert float(out[0] @ q) > float(out[1] @ q)
    # all-OOV text embeds as the zero vector, not NaN
    z = e.embed_documents(["zzzz qqqq"])
    assert np.allclose(z, 0.0) or np.isfinite(z).all()


def test_w2v_cooccurrence_counts_exact(spark):
    from mcpvectordb_spark.operators.w2v import cooccurrence_counts, vocab_top_n

    docs = spark.createDataFrame([(1, "a b a b"), (2, "a c")], "doc_id long, text string")
    vocab = vocab_top_n(docs, "text", 10)
    tid = {r["term"]: r["tid"] for r in vocab.collect()}
    cc = {(r["ta"], r["tb"]): r["n"]
          for r in cooccurrence_counts(docs, "doc_id", "text", vocab, window=2).collect()}
    # doc1 pairs within window 2: (a,b)x2? positions a0 b1 a2 b3:
    #   (0,1)(0,2)(1,2)(1,3)(2,3) -> ab, aa, ba, bb, ab ; doc2: ac
    ab = cc[(tid["a"], tid["b"])]
    assert ab == 3 and cc[(tid["b"], tid["a"])] == 3   # symmetric
    assert cc[(tid["a"], tid["a"])] == 2               # both directions of (a,a)
    assert cc[(tid["a"], tid["c"])] == 1


def test_audio_fingerprint_finds_shifted_copy(spark):
    """Constellation fingerprints match a time-shifted, half-amplitude
    copy at exactly the planted frame offset; an unrelated clip with a
    different tone sequence stays below the score threshold."""
    import math
    import struct

    from mcpvectordb_spark.asr import RATE
    from mcpvectordb_spark.sources.audiofp import audio_landmarks, match_clips

    def tone(seq, amp=12000):
        out = []
        for f in seq:
            out += [int(amp * math.sin(2 * math.pi * f * i / RATE)) for i in range(320)]
            out += [0] * 80
        return out

    def wav(s):
        pcm = struct.pack("<%dh" % len(s), *s)
        return (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE" + b"fmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, RATE, RATE * 2, 2, 16)
                + b"data" + struct.pack("<I", len(pcm)) + pcm)

    base = tone([500, 740, 620, 980, 560, 860, 700, 1040])
    shifted = [0] * (6 * 128) + [s // 2 for s in base]
    other = tone([1100, 480, 900, 640, 1000, 520, 780, 940])
    df = spark.createDataFrame(
        [("orig", wav(base)), ("copy", wav(shifted)), ("other", wav(other))],
        "media_id string, payload binary",
    )
    lm = audio_landmarks(df)
    hits = {(r["id_a"], r["id_b"]): (r["dt"], r["score"])
            for r in match_clips(lm, min_votes=5, min_score=0.8).collect()}
    assert ("copy", "orig") in hits
    dt, score = hits[("copy", "orig")]
    assert dt == -6 or dt == 6   # orig-vs-copy orientation depends on id sort
    assert score > 0.9
    assert all("other" not in k for pair in hits for k in pair)


def test_scd2_incremental_equals_full_rebuild(spark):
    """scd2_apply_increment(current, batch) == scd2_history(all obs):
    the dirty-key rebuild is lossless, untouched keys pass through."""
    from mcpvectordb_spark.operators.timeseries import scd2_apply_increment, scd2_history

    def mk(rows):
        return spark.createDataFrame(
            rows, "k long, attr string, sec long, tb long"
        ).select("k", "attr", F.timestamp_seconds("sec").alias("ts"), "tb")

    hist = [
        (1, "A", 10, 1), (1, "B", 20, 2), (1, "B", 30, 3),
        (2, "X", 10, 4),
        (3, "Q", 15, 5),
    ]
    inc = [
        (1, "A", 40, 6),           # flips key 1 back to A
        (2, "X", 50, 7),           # no-op repeat for key 2
        (4, "N", 60, 8),           # brand-new key
    ]
    current = scd2_history(mk(hist), "k", "attr", "ts", "tb")
    merged = scd2_apply_increment(current, mk(inc), "k", "attr", "ts", "tb")
    full = scd2_history(mk(hist + inc), "k", "attr", "ts", "tb")
    to_set = lambda df: {
        (r["key"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    }
    assert to_set(merged) == to_set(full)
    # key 3 was untouched: its row must be the literal pass-through
    assert any(r["key"] == 3 and r["is_current"] for r in merged.collect())


def test_bpe_merge_persistence_roundtrip(spark, tmp_path):
    from mcpvectordb_spark.operators.bpe import (
        bpe_encode,
        load_merges,
        save_merges,
        train_bpe,
        word_histogram,
    )

    docs = spark.createDataFrame(
        [(i, "the thermal theme therapy " * 3) for i in range(20)],
        "id long, text string",
    )
    hist = word_histogram(docs, "text")
    merges = train_bpe(hist, 12)
    p = str(tmp_path / "merges")
    save_merges(spark, merges, p)
    loaded = load_merges(spark, p)
    assert loaded == merges
    a = sorted(tuple(r["bpe_tokens"]) for r in bpe_encode(docs, "text", merges).collect())
    b = sorted(tuple(r["bpe_tokens"]) for r in bpe_encode(docs, "text", loaded).collect())
    assert a == b


def test_write_shards_jsonl_roundtrip(spark, tmp_path):
    import gzip
    import json as _json
    from pathlib import Path

    from mcpvectordb_spark.operators.curation import assign_shards, write_shards_jsonl

    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(100)], "doc_id long, text string"
    )
    p = str(tmp_path / "shards")
    write_shards_jsonl(docs, p, "doc_id", 4)
    dirs = sorted(d.name for d in Path(p).iterdir() if d.name.startswith("shard="))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    # every row lands exactly once; in-file order matches shard_pos order
    expected = {
        s: [r["doc_id"] for r in rows]
        for s, rows in (
            (s, assign_shards(docs, "doc_id", 4).filter(F.col("shard") == s)
             .orderBy("shard_pos").collect())
            for s in range(4)
        )
    }
    got_all = []
    for s in range(4):
        files = sorted(Path(p, f"shard={s}").glob("*.json.gz"))
        assert files, f"no gz parts in shard {s}"
        ids = []
        for f in files:
            with gzip.open(f, "rt") as fh:
                ids += [_json.loads(line)["doc_id"] for line in fh]
        assert ids == expected[s], f"order broken in shard {s}"
        got_all += ids
    assert sorted(got_all) == list(range(100))


def test_bm25_multi_topk_equals_per_query_loop(spark):
    """The batch scorer must reproduce bm25_topk exactly, query by query
    (same idf/tf math, same tiebreak), while building the posting list
    once."""
    from mcpvectordb_spark.operators.bm25 import bm25_multi_topk, bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark batch window join group"),
            (2, "window window join stream"),
            (3, "batch spark spark shuffle"),
            (4, "totally unrelated words here"),
            (5, "join join join window batch"),
        ],
        "doc_id long, text string",
    )
    queries = {0: "window join", 1: "spark batch", 2: "absent term"}
    multi = bm25_multi_topk(docs, queries, 3, "doc_id", "text")
    got = {
        qid: [(r["doc"], round(r["score"], 10)) for r in
              multi.filter(F.col("qid") == qid).orderBy("rank").collect()]
        for qid in queries
    }
    for qid, q in queries.items():
        solo = [(r["doc"], round(r["score"], 10)) for r in
                bm25_topk(docs, q, 3, "doc_id", "text").collect()]
        assert got[qid] == solo, (qid, got[qid], solo)
    assert got[2] == []  # absent terms -> no rows, not an error
