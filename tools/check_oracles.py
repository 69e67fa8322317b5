"""Local stand-in for the driver's CORRECTNESS gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, column
names, and order-insensitive values (sorted by all columns)."""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from cord19_crawler_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main(only: list[str] | None = None):
    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "8g"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs, osql = entry.queries(), entry.oracle_sql()
    if only:
        unknown = set(only) - set(qs)
        if unknown:
            # a typo'd name must not become a silent green gate
            print(f"==> UNKNOWN QUERY NAMES: {sorted(unknown)}")
            return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            # persist so the TWO faithful actions (toPandas for the driver-
            # mirroring dtype gate, collect for python-native values — no
            # numpy scalars to poison the repr-keyed sort) compute the query
            # ONCE instead of twice
            sdf = sdf.persist()
            try:
                spdf = sdf.toPandas()
                srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
            finally:
                sdf.unpersist()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        sql = osql.get(name)
        if sql is None:
            print(f"SKIP-ORACLE {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = [tuple(norm(v) for v in r) for r in res.fetchall()]
            # second (cheap, duckdb-local) execution purely for the pandas
            # dtype gate — .df() and fetchall can't share one result set,
            # and hand-mapping dtypes would risk gate drift
            opdf = con.execute(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: DUCKDB ERROR {str(e)[:300]}")
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={scols} duck={ocols}")
            ok = False
        # the driver's hash gate is DTYPE-sensitive (r1: DuckDB HUGEINT vs
        # Spark long hash-mismatched despite equal values) — mirror it here.
        # datetime64 RESOLUTION (ns vs us) is NOT significant: the driver
        # normalizes timestamps (r1 precedent: events_hourly_rollup green
        # with spark ns vs duckdb us).
        def _dt(x) -> str:
            d = str(x)
            return "datetime64" if d.startswith("datetime64") else d

        sd = {c: _dt(spdf[c].dtype) for c in spdf.columns}
        od = {c: _dt(opdf[c].dtype) for c in opdf.columns}
        if ok and sd != od:
            print(f"FAIL {name}: pandas dtypes differ spark={sd} duck={od}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(orows)}")
            ok = False
        else:
            # order-insensitive compare with column-name alignment
            s_ix = [scols.index(c) for c in sorted(scols)]
            o_ix = [ocols.index(c) for c in sorted(ocols)]
            # repr-keyed sort: rollup/cube rows contain None group keys,
            # which plain tuple ordering can't compare against strings
            sset = sorted([tuple(r[i] for i in s_ix) for r in srows], key=repr)
            oset = sorted([tuple(r[i] for i in o_ix) for r in orows], key=repr)
            if sset != oset:
                diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                print(f"FAIL {name}: values differ; first diffs {diff}")
                ok = False
        if ok:
            print(f"OK   {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print("\n==>", "ALL OK" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
