#!/usr/bin/env python3
"""Single-node DuckDB comparator timings: run selected oracle SQL
(from a Verify dump's oracle_sql.json) against the sf tables and print
one JSON line of per-query wall seconds. This is the honest comparator
the repo's COVERAGE.md tier tables cite — same SQL the correctness gate
runs, timed on the same machine.

Usage: duck_bench.py SFDIR ORACLE_JSON [q1,q2,...]
(default queries: the heavy tier)."""
import json, os, sys, time
import duckdb

HEAVY = ("q_dedup_cluster q_simhash_candidates q_simhash_candidates_capped "
         "q_curate q_embed_ann_ivfpq q_doc_near_dup q_minhash_candidates").split()

def main(sfdir, oracle_json, names):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_json))
    out = {}
    for name in names:
        sql = oracle.get(name)
        if sql is None:
            out[name] = None
            continue
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
            out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        except Exception as e:  # comparator may lack a dialect feature
            out[name] = {"err": str(e).split("\n")[0][:200]}
    print(json.dumps({"sf": sfdir, "queries": out}))

if __name__ == "__main__":
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else HEAVY
    main(sys.argv[1], sys.argv[2], names)
