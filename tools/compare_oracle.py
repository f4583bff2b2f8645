#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>

For each query output parquet under <verify_out_dir>/<name>/ and its SQL in
oracle_sql.json, runs the SQL in DuckDB over the sf tables and compares
rows / schema / values (exact, after sorting columns by name and rows by all
columns).
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _digest(sql, pq):
    # verdicts are keyed to WHAT was judged: the oracle SQL text and the
    # spark output's identity (path + mtime) — fixing a query or
    # re-running Verify invalidates the stale verdict automatically
    h = hashlib.sha256(sql.encode())
    for p in sorted(pq):
        h.update(p.encode())
        h.update(str(os.stat(p).st_mtime_ns).encode())
    return h.hexdigest()[:16]


def main(outdir, sfdir, state=None):
    # state file (long-scale runs): per-query results persist across
    # kills; already-judged queries are skipped on relaunch
    done = {}
    if state and os.path.exists(state):
        try:
            done = json.load(open(state))
        except ValueError:
            done = {}  # truncated by a kill mid-write of a pre-atomic file
    def record(name, verdict, digest):
        if state:
            done[name] = {"verdict": verdict, "digest": digest}
            # atomic: a kill mid-dump must not truncate the live file
            tmp = state + ".tmp"
            # close+flush BEFORE the replace: relying on refcount GC to
            # flush the handle is CPython-only (an unflushed temp file
            # would be promoted truncated elsewhere)
            with open(tmp, "w") as f:
                json.dump(done, f)
            os.replace(tmp, state)
    def recorded(name, digest):
        e = done.get(name)
        if isinstance(e, str):  # legacy entry: no digest, re-judge
            return None
        if isinstance(e, dict) and e.get("digest") == digest:
            return e.get("verdict")
        return None
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata = single file; Sf1Gen output = Spark directory
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pq = glob.glob(os.path.join(outdir, name, "*.parquet"))
        dig = _digest(sql, pq)
        prior = recorded(name, dig)
        if prior is not None:
            n_pass += prior == "pass"
            n_fail += prior != "pass"
            continue
        if not pq:
            print(f"FAIL {name}: no spark output", flush=True)
            record(name, "no-output", dig)
            n_fail += 1
            continue
        try:
            sp = con.execute(f"SELECT * FROM '{pq[0]}'").fetchdf()
            du = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}", flush=True)
            record(name, "error", dig)
            n_fail += 1
            continue
        sp = sp.reindex(sorted(sp.columns), axis=1)
        du = du.reindex(sorted(du.columns), axis=1)
        for frame in (sp, du):  # bytearray (binary cols) is unhashable
            for c in frame.columns:
                if frame[c].dtype == object and frame[c].map(
                        lambda v: isinstance(v, (bytes, bytearray))).any():
                    frame[c] = frame[c].map(
                        lambda v: bytes(v) if isinstance(v, (bytes, bytearray)) else v)
        problems = []
        if list(sp.columns) != list(du.columns):
            problems.append(f"schema: spark={list(sp.columns)} duck={list(du.columns)}")
        elif len(sp) != len(du):
            problems.append(f"rows: spark={len(sp)} duck={len(du)}")
        else:
            sp2 = sp.sort_values(by=list(sp.columns)).reset_index(drop=True)
            du2 = du.sort_values(by=list(du.columns)).reset_index(drop=True)
            for c in sp.columns:
                a, b = sp2[c], du2[c]
                try:
                    b = b.astype(a.dtype)
                except Exception:
                    problems.append(f"dtype {c}: {a.dtype} vs {b.dtype}")
                    continue
                neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    i = neq.idxmax()
                    problems.append(
                        f"value {c}@row{i}: spark={a[i]!r} duck={b[i]!r} "
                        f"(n_mismatch={int(neq.sum())})")
                if str(sp2[c].dtype) != str(du2[c].dtype):
                    problems.append(f"dtype-warn {c}: {sp2[c].dtype} vs {du2[c].dtype}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:4]), flush=True)
            record(name, "mismatch", dig)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sp)} rows)", flush=True)
            record(name, "pass", dig)
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
