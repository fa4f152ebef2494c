#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's correctness gate:
read each Verify output parquet, run its oracle SQL in DuckDB over the same
sf dir, and compare sorted rows exactly (schema + values). Strictly a
development tool — the Scala library never depends on this.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
            g_cols = sorted(got.columns)
            w_cols = sorted(want.columns)
            if g_cols != w_cols:
                print(f"FAIL {name}: columns {g_cols} vs {w_cols}")
                failures += 1
                continue
            # dtype-strict: the driver's hash gate is type-sensitive, so
            # 128 (BIGINT) vs 128.0 (DuckDB HUGEINT promotion of an
            # uncast window/aggregate sum) must FAIL here too, not
            # silently pass the value compare below. Compare numpy
            # dtype KINDS (i/u = integer, f = float, b = bool, ...) so
            # int32 vs int64 width differences stay fine but an
            # integer-vs-float leak is flagged.
            kind_mismatch = [
                (c, str(got[c].dtype), str(want[c].dtype))
                for c in g_cols
                if got[c].dtype.kind != want[c].dtype.kind]
            if kind_mismatch:
                print(f"FAIL {name}: dtype mismatch (spark vs oracle): "
                      f"{kind_mismatch}")
                failures += 1
                continue
            from collections import Counter
            g = Counter(tuple(norm(v) for v in row)
                        for row in got[g_cols].itertuples(index=False))
            w = Counter(tuple(norm(v) for v in row)
                        for row in want[w_cols].itertuples(index=False))
            if sum(g.values()) != sum(w.values()):
                print(f"FAIL {name}: rows {sum(g.values())} vs {sum(w.values())}")
                failures += 1
                continue
            if g != w:
                only_g = list((g - w).items())[:1]
                only_w = list((w - g).items())[:1]
                print(f"FAIL {name}: multiset mismatch; spark-only {only_g} "
                      f"oracle-only {only_w}")
                failures += 1
            else:
                print(f"PASS {name} ({sum(g.values())} rows)")
        except Exception as e:
            print(f"ERROR {name}: {e}")
            failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
