"""Registry-wide plan smell scan: per query, count parquet scans per table,
join strategies, Python eval nodes, cartesian products, exchanges.
Usage: python /tmp/plan_smells.py [name ...]   (default: all)"""
import re
import sys

sys.path.insert(0, "/root/repo")

from tp1_distribuidos_mapreduce_spark import registry
from tp1_distribuidos_mapreduce_spark.session import get_spark


def main():
    spark = get_spark("smells")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    qs = registry.queries()
    names = sys.argv[1:] or list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:
            print(f"{name}: ERR {type(ex).__name__}: {str(ex)[:80]}")
            continue
        scans = re.findall(r"FileScan parquet \[?[^\[\]]*\]?|Scan parquet ([^\s]*)", plan)
        n_scan = plan.count("Scan parquet")
        smj = plan.count("SortMergeJoin")
        shj = plan.count("ShuffledHashJoin")
        bnl = plan.count("BroadcastNestedLoopJoin")
        cart = plan.count("CartesianProduct")
        pyev = plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
        mip = plan.count("MapInPandas") + plan.count("MapInArrow")
        exch = plan.count("Exchange ")
        flags = []
        if n_scan > 2: flags.append(f"scans={n_scan}")
        if smj: flags.append(f"SMJ={smj}")
        if cart: flags.append(f"CART={cart}")
        if pyev: flags.append(f"pyUDF={pyev}")
        if exch >= 10: flags.append(f"exch={exch}")
        if bnl > 3: flags.append(f"BNLJ={bnl}")
        if flags:
            print(f"{name}: {' '.join(flags)}")
    spark.stop()


if __name__ == "__main__":
    main()
