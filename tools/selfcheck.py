#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]

Runs `sbt runMain graft.Verify <sfDir> <outDir>` is expected to have been run
already (or pass --run to run it here), then for each result parquet under
outDir, executes the matching oracle SQL from oracle_sql.json in DuckDB over
the same parquet tables and compares row counts, column-name sets, and a
row-order-insensitive hash of values (floats rounded to 6 significant-ish
decimals).
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    if "--run" in sys.argv:
        subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", check=True)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    results = {}
    for d in sorted(out_dir.iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        got_cols = [c[0] for c in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            results[name] = f"ROWS-ONLY rows={len(got_rows)}"
            continue
        try:
            exp = con.execute(oracle[name])
            exp_cols = [c[0] for c in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        if sorted(got_cols) != sorted(exp_cols):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(got_cols)} duck={sorted(exp_cols)}"
        elif len(got_rows) != len(exp_rows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(got_rows)} duck={len(exp_rows)}"
        elif table_hash(got_rows, got_cols) != table_hash(exp_rows, exp_cols):
            # find a sample differing row for debugging
            g = sorted("|".join(canon(r[i]) for i in sorted(range(len(got_cols)), key=lambda i: got_cols[i])) for r in got_rows)
            e = sorted("|".join(canon(r[i]) for i in sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])) for r in exp_rows)
            diff = next(((a, b) for a, b in zip(g, e) if a != b), ("?", "?"))
            results[name] = f"HASH-MISMATCH rows={len(got_rows)} sample spark={diff[0][:120]} duck={diff[1][:120]}"
        else:
            results[name] = f"OK rows={len(got_rows)}"

    ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS-ONLY"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') or v.startswith('ROWS-ONLY') else 'FAIL':4} {k}: {v}")
    print(f"== {ok}/{len(results)} pass")
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
