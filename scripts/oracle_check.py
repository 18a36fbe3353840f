#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run Verify's outputs against
DuckDB oracles and diff strictly (schema + values + row order).

Usage: python3 scripts/oracle_check.py <sfDir> <outDir>
(run graft.Verify first to populate <outDir>)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        errs = compare(odf, sdf)
        if errs:
            n_fail += 1
            print(f"FAIL {name}:")
            for e in errs[:5]:
                print(f"   {e}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


def compare(odf, sdf):
    errs = []
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        return [f"columns differ: oracle={ocols} spark={scols}"]
    if len(odf) != len(sdf):
        errs.append(f"row count differs: oracle={len(odf)} spark={len(sdf)}")
        return errs
    odf, sdf = odf[ocols], sdf[ocols]
    for c in ocols:
        if str(odf[c].dtype) != str(sdf[c].dtype):
            errs.append(f"dtype[{c}]: oracle={odf[c].dtype} spark={sdf[c].dtype}")
    for i in range(len(odf)):
        for c in ocols:
            ov, sv = odf[c].iloc[i], sdf[c].iloc[i]
            if not eq(ov, sv):
                errs.append(f"row {i} col {c}: oracle={ov!r} spark={sv!r}")
                if len(errs) >= 8:
                    return errs
    return errs


def eq(a, b):
    import pandas as pd
    try:
        if (not (hasattr(a, "__len__") and not isinstance(a, str))
                and not (hasattr(b, "__len__") and not isinstance(b, str))
                and (pd.isna(a) or pd.isna(b))):
            return bool(pd.isna(a)) and bool(pd.isna(b))
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) or math.isnan(fb):
                return math.isnan(fa) and math.isnan(fb)
            return fa == fb  # strict: the driver hashes values
        if hasattr(a, "__len__") and not isinstance(a, str):
            return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
        return a == b
    except (TypeError, ValueError):
        return str(a) == str(b)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
