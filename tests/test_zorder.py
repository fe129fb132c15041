"""Z-order clustering: Morton key correctness + the layout actually
shrinks per-file min/max spans on BOTH dimensions (the pruning currency)."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.zorder import write_zordered, zorder_key


def _file_spans(path, col):
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append(hi - lo)
    return spans


def test_zorder_key_is_monotone_morton(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (1, 1), (3, 3)], "a int, b int")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b"), (0, 3), (0, 3), bits=2).alias("z")).collect()
    }
    # classic 2-bit Morton values: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3 (3,3)=15
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3, (3, 3): 15}


def test_zordered_layout_prunes_both_dims(spark, tmp_path):
    n = 1 << 12
    grid = spark.range(n).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(grid, zpath, "x", "y", (0, 63), (0, 63), n_files=16, bits=6)
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)

    # linear-on-x layout: x spans are tiny but y spans cover everything
    lin_y = _file_spans(lpath, "y")
    assert sum(lin_y) / len(lin_y) > 50
    # z-order: BOTH dims' average spans shrink well below full range
    z_x, z_y = _file_spans(zpath, "x"), _file_spans(zpath, "y")
    assert sum(z_x) / len(z_x) < 32, z_x
    assert sum(z_y) / len(z_y) < 32, z_y
