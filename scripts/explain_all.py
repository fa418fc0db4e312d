"""Capture `.explain("formatted")` for every declared query into plans/<tag>/.

Evidence files for the optimization rounds: one `<query>_<suffix>.txt` per
entry, written with the SAME session config as bench.py so the captured plan
is the benched plan.  Also prints a one-line plan-health summary per query
(Exchange count, python-eval nodes, scan columns) to stdout.

    python scripts/explain_all.py <out_dir> <suffix> [query ...]

e.g.  python scripts/explain_all.py plans/r12 before
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    # bench.py parity: the perf config comes from the same library helper
    # (tidier_spark.session.recommended_conf), so the captured plan is the
    # benched plan by construction.
    from tidier_spark.session import recommended_conf, shuffle_partitions

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("explain-all")
        .config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions(int(cpus)))
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
    )
    for k, v in recommended_conf().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:
            print(f"ERR   {name}: {exc}")
            continue
        finally:
            spark.catalog.clearCache()
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_py = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas|PythonMapInArrow", plan)
        )
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_cart = len(re.findall(r"Cartesian|BroadcastNestedLoopJoin", plan))
        print(
            f"OK    {name}: exchanges={n_ex} py={n_py} smj={n_smj} "
            f"bhj={n_bhj} nlj={n_cart}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
