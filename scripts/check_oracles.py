"""Driver-faithful correctness gate replica.

Runs every registered query twice at a given SF dir — the Spark engine
path and the DuckDB oracle — and compares the way the driver does:

- rows_match: row counts equal
- schema_match: sorted column-name sets equal
- hash_match: a TYPE-SENSITIVE value hash over (sorted columns, sorted
  rows).  Values are reduced to a canonical repr that preserves the
  int-vs-Decimal-vs-float distinction, so a DuckDB ``SUM() ->
  decimal128`` leaking through an un-cast oracle is caught here even
  though the numeric values are equal (the round-1 failure mode).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys

sys.path.insert(0, "/root/repo")

# ONE canonicalization for both gate replicas: the pytest-level compare
# and this hash build from the same canon, so they cannot drift
from gocrawler_spark.queries.compare import TABLES, canon, duck_connection  # noqa: E402


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_oracles")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duck_connection(sf_dir)

    from gocrawler_spark.queries import ORACLES, QUERIES

    report = {}
    n_green = n_bad = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name not in ORACLES:
            # a query the driver cannot value-check is a GAP, not a skip
            report[name] = {"err": "no_oracle"}
            n_bad += 1
            print(f"FAIL {name}: no_oracle", flush=True)
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
            cur = con.execute(ORACLES[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = [tuple(r) for r in cur.fetchall()]
            rm = len(s_rows) == len(o_rows)
            sm = sorted(s_cols) == sorted(o_cols)
            hm = sm and value_hash(s_cols, s_rows) == value_hash(o_cols, o_rows)
            report[name] = {
                "rows_match": rm,
                "schema_match": sm,
                "hash_match": hm,
                "spark_rows": len(s_rows),
                "oracle_rows": len(o_rows),
            }
            ok = rm and sm and hm
            n_green += ok
            n_bad += not ok
            print(("PASS " if ok else "FAIL ") + name, flush=True)
            if not ok and s_rows and o_rows:
                order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                oorder = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                srt = sorted(
                    "\x01".join(canon(r[i]) for i in order) for r in s_rows
                )
                ort = sorted(
                    "\x01".join(canon(r[i]) for i in oorder) for r in o_rows
                )
                for a, b in zip(srt, ort):
                    if a != b:
                        print("  spark :", a[:300])
                        print("  oracle:", b[:300])
                        break
        except Exception as e:  # noqa: BLE001
            report[name] = {"err": f"{type(e).__name__}: {e}"}
            n_bad += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)

    print(f"\n{n_green} green, {n_bad} bad")
    with open("/tmp/check_oracles.json", "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
