"""Ad-hoc single-query differential: spark vs DuckDB oracle.

Usage: python tools/dev_check.py q_name [q_name ...] [--sf /root/testdata/sf0.01]
Fast iteration loop while developing a new operator; the real gates are
tests/test_correctness.py and tools/full_correctness.py.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    args: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1

    from pokertracker_cassandra_st_spark.registry import get_queries, get_oracles
    from pokertracker_cassandra_st_spark.session import get_spark
    from tests.differ import assert_frames_match, duck_connection

    qs, oracles = get_queries(), get_oracles()
    spark = get_spark("dev-check")
    con = duck_connection(sf_dir)
    rc = 0
    for name in args:
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            opdf = con.execute(oracles[name]).fetchdf()
            assert_frames_match(spdf, opdf, name)
            print(f"PASS {name}: {len(spdf)} rows  {time.time()-t0:.1f}s")
        except Exception as e:
            rc = 1
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:2000]}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
