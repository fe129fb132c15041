"""operators/chat.py — SFT conversation validation/flattening."""

from pyspark.sql import functions as F

from mcpvectordb_spark.operators.chat import chat_stats


def test_chat_stats_validation_matrix(spark):
    rows = [
        (1, '[{"role":"user","content":"hi"},{"role":"assistant","content":"hello"}]'),
        (2, '[{"role":"system","content":"be nice"},{"role":"user","content":"hi"},{"role":"assistant","content":"ok"}]'),
        (3, '[{"role":"bot","content":"hi"},{"role":"assistant","content":"x"}]'),
        (4, '[{"role":"user","content":"a"},{"role":"user","content":"b"}]'),
        (5, '[{"role":"user","content":"a"}'),          # malformed JSON
        (6, '[{"role":"user","content":"a"},{"role":"assistant","content":""}]'),
        (7, '[{"role":"user","content":"a"},{"role":"assistant","content":"b"},{"role":"user","content":"c"},{"role":"assistant","content":"d"}]'),
        (8, '[{"role":"assistant","content":"starts wrong"},{"role":"user","content":"x"}]'),
    ]
    df = spark.createDataFrame(rows, "id long, messages string")
    out = {r["id"]: r for r in chat_stats(df, "id", "messages").collect()}
    assert out[1]["valid"] and out[1]["flat_text"] == "<|user|>hi<|assistant|>hello"
    assert out[2]["valid"] and out[2]["n_turns"] == 3  # system lead allowed
    assert not out[3]["roles_ok"] and not out[3]["valid"]
    assert not out[4]["alternation_ok"] and not out[4]["valid"]
    assert out[5]["n_turns"] == -1 and not out[5]["valid"]  # unparseable
    assert not out[6]["valid"]  # empty assistant content
    assert out[7]["valid"] and out[7]["n_turns"] == 4
    assert out[7]["user_chars"] == 2 and out[7]["assistant_chars"] == 2
    assert not out[8]["alternation_ok"] and not out[8]["valid"]
    # invalid conversations never emit training text
    for bad in (3, 4, 5, 6, 8):
        assert out[bad]["flat_text"] is None
