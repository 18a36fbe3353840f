#!/usr/bin/env python3
"""Build a 10x scale-up of an sf directory for scaling measurements
(SCALING.md "Measured 10x scale-up").

Ten key-shifted copies of every table: each copy's key columns shift by
copy_index * 1e9, so referential integrity holds within a copy and
joins fan out linearly. Tables are written multi-file (PER_THREAD_OUTPUT)
so Spark scans parallelize like a real deployment. events.ts is
re-encoded as raw INT64 nanoseconds — the pre-round-7 driver encoding,
kept deliberately so 10x runs exercise Tables.events' nanos branch
while the regenerated /root/testdata exercises the timestamp[us] one
(both are pinned by TimestampEncodingSpec fixtures regardless).

Usage: python3 scripts/make_scale10.py [srcDir] [dstDir]
Then:  SPARK_GRAFT_SF_DIR=<dstDir> sbt "runMain graft.Bench"
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
# optional 3rd arg: copy count (e.g. 100 for the 100x validation).
# Always scale from the ORIGINAL sf dir, never from a scaled output:
# the key shift is copy_index * 1e9, so re-scaling a scaled dir would
# collide keys across copies (and re-encode ts twice).
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
K = 10 ** 9

KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    # a COPIES-branch UNION ALL parses as a COPIES-deep expression tree;
    # the default depth cap (1000) rejects the 1000x corpus build
    con.execute(f"SET max_expression_depth TO {max(1000, 3 * COPIES)}")
    os.makedirs(DST, exist_ok=True)
    for t, ks in KEYS.items():
        cols = [r[0] for r in
                con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sels = []
        for i in range(COPIES):
            proj = ", ".join(
                f"({c} + {i * K}) AS {c}" if c in ks
                else (f"CAST(epoch_ns({c}) AS BIGINT) AS {c}"
                      if t == "events" and c == "ts" else c)
                for c in cols)
            sels.append(f"SELECT {proj} FROM '{SRC}/{t}.parquet'")
        # clear stale part-files: a rerun emitting fewer files than the
        # previous run would otherwise silently inflate the corpus
        shutil.rmtree(f"{DST}/{t}.parquet", ignore_errors=True)
        os.makedirs(f"{DST}/{t}.parquet", exist_ok=True)
        con.execute(
            f"COPY ({' UNION ALL '.join(sels)}) TO '{DST}/{t}.parquet' "
            "(FORMAT PARQUET, PER_THREAD_OUTPUT, OVERWRITE_OR_IGNORE)")
        n = con.execute(
            f"SELECT COUNT(*) FROM '{DST}/{t}.parquet/*.parquet'").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
