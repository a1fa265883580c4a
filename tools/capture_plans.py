"""Capture .explain("formatted") for named queries into plans/r13/.

Usage: python tools/capture_plans.py <suffix> name [name ...] [--sf DIR]
Writes plans/r13/<name>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    suffix = argv[0]
    i = 1
    while i < len(argv):
        if argv[i] == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1

    from pokertracker_cassandra_st_spark.plans.inspect import explain_str
    from pokertracker_cassandra_st_spark.registry import REGISTRY, get_queries
    from pokertracker_cassandra_st_spark.session import get_spark

    get_queries()
    spark = get_spark("capture-plans")
    out_dir = REPO / "plans" / "r13"
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        text = explain_str(df)
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(text)
        print(f"wrote {path} ({len(text)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
