"""Simulate the driver's correctness gate end-to-end.

Imports ``__spark_entry__`` exactly as the driver does, runs
``entry(spark)``, then every ``queries()[name]`` at the given sf dir
against ``oracle_sql()[name]`` in DuckDB (row count + columns +
order-insensitive values). Usage:

    python scripts/driver_sim.py [sf_dir] [name_substring]
    # sf_dir default /root/testdata/sf0.01; the optional second arg
    # filters to queries whose name contains it (fast iteration on one
    # query — the full run is still the gate)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry_mod
    from oracle_compare import compare, duckdb_connection

    from pids_drg_esoa_spark.session import get_spark

    spark = get_spark(app_name="driver-sim")
    df = entry_mod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={[f.name for f in df.schema.fields]}")
    assert n >= 0

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if len(sys.argv) > 2:
        qs = {n: f for n, f in qs.items() if sys.argv[2] in n}
    con = duckdb_connection(sf_dir)
    failed, tol, rows_only = [], [], []
    for name in sorted(qs):
        t0 = time.time()
        sdf = qs[name](spark, sf_dir)
        if name not in oracles:
            cnt = sdf.count()
            rows_only.append(name)
            print(f"  {name:40s} rows-only ({cnt} rows) [{time.time()-t0:.1f}s]")
            continue
        res = compare(name, sdf, con, oracles[name])
        status = "OK " if res.ok and res.exact else ("TOL" if res.ok else "FAIL")
        print(f"  {name:40s} {status} [{time.time()-t0:.1f}s] {res.detail}")
        if not res.ok:
            failed.append(name)
        elif not res.exact:
            tol.append(name)
    print(
        f"\n{len(qs)} queries: {len(qs)-len(failed)-len(tol)-len(rows_only)} exact, "
        f"{len(tol)} tolerance-only, {len(rows_only)} rows-only, {len(failed)} FAILED"
    )
    if failed:
        print("FAILED:", failed)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
