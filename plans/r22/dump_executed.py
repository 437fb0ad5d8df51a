"""Dump the EXECUTED .explain('formatted') for named registry queries into
plans/r22/<query>_<tag>.txt. Unlike dump_plans.py this materializes the
frame through the noop sink first, so AQE's final plan (AQEShuffleRead,
runtime ReusedExchange, final join strategies) is what gets recorded —
the form the reuse claims of this round are checkable against.

Usage: python plans/r22/dump_executed.py <before|after> q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tp1_distribuidos_mapreduce_spark import registry  # noqa: E402
from tp1_distribuidos_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        # collect() (not a noop write) so the df's OWN QueryExecution is
        # the one that runs — a write command wraps a fresh execution and
        # leaves df's plan unexecuted (isFinalPlan=false, no reuse nodes).
        df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
