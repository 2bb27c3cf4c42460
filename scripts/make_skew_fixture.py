#!/usr/bin/env python3
"""Skew-soak fixture generator (r15): deterministic hot-key variants of the
driver's testdata tables, for running the FULL correctness battery under
the second 100x-scale failure mode the partition-count soak cannot reach —
key skew. The oracle (check_correctness.py) reads the same skewed dir, so
every gate stays oracle-checked; only the key distribution changes:

  - lineitem: one hot l_orderkey (the smallest existing o_orderkey) holds
    ~50% of rows (l_partkey % 2 = 0) -> the salted-join / groupBy stress.
    Collapsed rows get a fresh l_linenumber (100000 + row ordinal over
    the original unique key) so the table's documented unique row key
    (l_orderkey, l_linenumber, l_partkey, l_suppkey) SURVIVES the
    collapse - the catalog-plane gates (combine_by_coords, agg_*) and
    their oracles legitimately assume it, and breaking it tests nothing
    but coordinate-collision fan-out;
  - events:   one hot user_id (the smallest) holds ~50% of rows
    (user_id % 2 = 0) -> sessionize/funnel/asof window-state stress;
  - documents: 10% of docs (doc_id % 10 = 7) share ONE text -> hot
    dedup groups, hot LSH buckets, hot posting terms. Deliberately 10%,
    not 50%: identical-text mass generates candidate PAIRS quadratically,
    and the engine's documented driver-collect bounds (1M-pair union-find
    etc.) are supposed to refuse past that - the soak tests skew
    handling, not the refusal path;
  - embeddings: 10% of vectors (vec_id % 10 = 7) share ONE embedding ->
    a hot IVF cell / LSH signature bucket (hot ids falling inside the
    gates' query ranges just make those queries identical, which is
    deterministic under the shared tie rules).

All transforms are pure SQL CASE expressions - no RNG, so the fixture is
bit-reproducible. Usage: make_skew_fixture.py <srcSfDir> <dstDir>
"""
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')")

    sql = {}
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        sql[t] = f"SELECT * FROM {t}"
    ln_type, = con.execute(
        "SELECT typeof(l_linenumber) FROM lineitem LIMIT 1").fetchone()
    sql["lineitem"] = f"""
        SELECT * EXCLUDE (__rn) REPLACE (
          CASE WHEN l_partkey % 2 = 0
               THEN (SELECT min(o_orderkey) FROM orders)
               ELSE l_orderkey END AS l_orderkey,
          CAST(CASE WHEN l_partkey % 2 = 0 THEN 100000 + __rn
               ELSE l_linenumber END AS {ln_type}) AS l_linenumber)
        FROM (SELECT *, row_number() OVER (ORDER BY l_orderkey,
                l_linenumber, l_partkey, l_suppkey) AS __rn
              FROM lineitem)"""
    sql["events"] = """
        SELECT * REPLACE (
          CASE WHEN user_id % 2 = 0
               THEN (SELECT min(user_id) FROM events)
               ELSE user_id END AS user_id)
        FROM events"""
    sql["documents"] = """
        SELECT * REPLACE (
          CASE WHEN doc_id % 10 = 7
               THEN 'skewhot alpha beta gamma delta epsilon zeta eta theta iota kappa'
               ELSE text END AS text)
        FROM documents"""
    # vec_id = 17 is the first hot-pattern id outside the vec_id < 3
    # driver-battery range (so those three queries keep distinct vectors)
    sql["embeddings"] = """
        SELECT * REPLACE (
          CASE WHEN vec_id % 10 = 7
               THEN (SELECT embedding FROM embeddings WHERE vec_id = 17)
               ELSE embedding END AS embedding)
        FROM embeddings"""

    for t in TABLES:
        out = f"{dst}/{t}.parquet"
        con.execute(f"COPY ({sql[t]}) TO '{out}' (FORMAT PARQUET)")
        n, = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()
        print(f"[skew] {t}: {n} rows -> {out}")
    # report the achieved skew so the soak log is self-describing
    for label, q in [
        ("lineitem hot-orderkey share",
         "SELECT max(c) * 1.0 / sum(c) FROM (SELECT l_orderkey, count(*) c "
         f"FROM read_parquet('{dst}/lineitem.parquet') GROUP BY 1)"),
        ("events hot-user share",
         "SELECT max(c) * 1.0 / sum(c) FROM (SELECT user_id, count(*) c "
         f"FROM read_parquet('{dst}/events.parquet') GROUP BY 1)"),
        ("documents hot-text share",
         "SELECT max(c) * 1.0 / sum(c) FROM (SELECT text, count(*) c "
         f"FROM read_parquet('{dst}/documents.parquet') GROUP BY 1)"),
    ]:
        share, = con.execute(q).fetchone()
        print(f"[skew] {label}: {share:.3f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
