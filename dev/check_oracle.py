#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir> [entry ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the parquet
tables in <sfDir>, and compares: row count, column names (sorted), and a
hash of the values with columns sorted by name — the same shape the driver
checks. Prints one line per entry; exits non-zero if any entry mismatches.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            # driver-style value hashing tolerates float repr noise via
            # rounding; entries already round() so this is belt+braces
            return round(v, 6) + 0.0  # -0.0 -> 0.0
        return v

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    bad = []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); bad.append(name); continue
        sq = con.execute(
            f"SELECT * FROM read_parquet({files!r})")
        s_rows, s_cols = sq.fetchall(), [d[0] for d in sq.description]
        if name not in oracle:
            print(f"{name}: rows-only ({len(s_rows)} rows)"
                  + (" EMPTY!" if not s_rows else ""))
            if not s_rows:
                bad.append(name)
            continue
        try:
            oq = con.execute(oracle[name])
            o_rows, o_cols = oq.fetchall(), [d[0] for d in oq.description]
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR {e}"); bad.append(name); continue
        ok_rows = len(s_rows) == len(o_rows)
        ok_schema = sorted(s_cols) == sorted(o_cols)
        ok_hash = ok_rows and ok_schema and canon(s_rows, s_cols) == canon(o_rows, o_cols)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else \
            f"MISMATCH rows={ok_rows}({len(s_rows)}/{len(o_rows)}) schema={ok_schema} hash={ok_hash}"
        print(f"{name}: {status}")
        if not (ok_rows and ok_schema and ok_hash):
            bad.append(name)
    if bad:
        print("FAILED:", ", ".join(bad)); sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
