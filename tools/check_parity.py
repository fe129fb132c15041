"""Local replica of the driver's t2 correctness gate: run every catalog
query on Spark AND its DuckDB oracle at the given sf dir, compare row
counts, column names, and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

from mcpvectordb_spark.catalog import ORACLES, QUERIES
from mcpvectordb_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    # NULL- and mixed-type-safe ordering (norm_cell maps NaN → the STRING
    # 'nan', so a float column can hold both floats and strings): sort on
    # (presence, type name, repr) — only determinism matters, and it is
    # identical on the Spark and DuckDB sides by construction
    return sorted(
        normed,
        key=lambda row: tuple(
            (c is not None, type(c).__name__, repr(c)) for c in row
        ),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    unknown = only - set(QUERIES)
    if unknown:
        # a typo'd name must not produce a vacuous '0 passed, 0 failed' green
        print(f"unknown queries: {sorted(unknown)}; valid: {sorted(QUERIES)}")
        sys.exit(2)
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    passed = failed = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {type(exc).__name__}: {str(exc)[:300]}")
            failed += 1
            continue
        sql = ORACLES.get(name)
        if sql is None:
            status = "ROWS-ONLY" if len(srows) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{'ok  ' if srows else 'WARN'} {name}: {status} rows={len(srows)}")
            passed += 1 if srows else 0
            failed += 0 if srows else 1
            continue
        try:
            # .df() first: pandas dtypes are what the driver's value-hash
            # serializes (HUGEINT -> float64 there, but Python int via
            # fetchall) -- keep both views so dtype-kind skew is caught.
            odf = con.execute(sql).df()
            ocols = list(odf.columns)
            orows = list(con.execute(sql).fetchall())
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {type(exc).__name__}: {str(exc)[:300]}")
            failed += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            failed += 1
            continue
        sn, on = norm_rows(scols, srows), norm_rows(ocols, orows)
        if len(sn) != len(on):
            print(f"FAIL {name}: rowcount spark={len(sn)} oracle={len(on)}")
            failed += 1
            continue
        mismatch = [(a, b) for a, b in zip(sn, on) if a != b]
        if mismatch:
            print(f"FAIL {name}: {len(mismatch)}/{len(sn)} rows differ; first: spark={mismatch[0][0]} oracle={mismatch[0][1]}")
            failed += 1
            continue
        # Dtype-kind skew: the driver hashes pandas-serialized values, where
        # int64 5 ("5") != float64 5.0 ("5.0").  A NULL-free column whose
        # kinds differ across engines passes the value compare above but
        # fails the driver hash (round-1 pack_sequences bug).
        skew = []
        sidx = {c: i for i, c in enumerate(scols)}
        for c in ocols:
            okind = odf[c].dtype.kind  # 'i', 'f', 'O', ...
            stype = dict(sdf.dtypes).get(c, "")
            skind = "i" if stype in ("bigint", "int", "smallint", "tinyint") else (
                "f" if stype in ("double", "float") else "O")
            if {okind, skind} == {"i", "f"}:
                has_null = any(r[sidx[c]] is None for r in srows)
                if not has_null:
                    skew.append((c, stype, str(odf[c].dtype)))
        if skew:
            print(f"FAIL {name}: dtype-kind skew (driver-hash hazard): {skew}")
            failed += 1
        else:
            print(f"ok   {name}: {len(sn)} rows match")
            passed += 1
    print(f"\n{passed} passed, {failed} failed")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
