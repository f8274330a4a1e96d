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
    passes = int(os.environ.get("DUCK_PASSES", "3"))
    out = {}
    for name in names:
        sql = oracle.get(name)
        if sql is None:
            out[name] = None
            continue
        # min over passes: the comparator is subject to the same box
        # weather as the Spark side, so the ratio_norm denominator is a
        # min-under-stated-weather just like the spark_min numerator
        secs, rows, err = [], None, None
        for _ in range(passes):
            t0 = time.time()
            try:
                rows = len(con.execute(sql).fetchall())
                secs.append(time.time() - t0)
            except Exception as e:  # comparator may lack a dialect feature
                err = str(e).split("\n")[0][:200]
                break
        if err is not None:
            out[name] = {"err": err}
        else:
            # "sec" stays the FIRST (coldest) pass — the denominator the
            # official ratio_total has carried since r15, so the trend
            # line stays comparable; "min" feeds the weather-normalized
            # ratio_norm
            out[name] = {"sec": round(secs[0], 3),
                         "min": round(min(secs), 3),
                         "rows": rows}
    print(json.dumps({"sf": sfdir, "passes": passes, "queries": out}))

if __name__ == "__main__":
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else HEAVY
    main(sys.argv[1], sys.argv[2], names)
