"""Interleaved same-session A/B for r13 optimization candidates.

Both arms run in ONE session, alternating A,B,B,A per rep-pair (ABBA) so
host-regime drift hits both arms equally (the r12 continuation discipline);
per-arm metric is min over reps.  Deterministic job/stage/task counts come
from the status tracker via a per-run job group — those survive any regime.

    python scripts/ab_r13.py <experiment> [reps_per_arm]

Experiments: minhash_buckets | tpch_q21 | eval_auc
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def build_session():
    from pyspark.sql import SparkSession

    from tidier_spark.session import recommended_conf, shuffle_partitions

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-r13")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions(int(cpus))))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
    )
    for k, v in recommended_conf().items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def timed(spark, thunk, group):
    # thunk: () -> DataFrame.  Building the frame is INSIDE the timed
    # region — the iterative entries (CC rounds, pagerank unrolls, BPE
    # merges) execute collect()s during plan construction, exactly as
    # bench.py times them.
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    t0 = time.perf_counter()
    thunk().write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    st = sc.statusTracker()
    jobs = st.getJobIdsForGroup(group)
    n_stages = n_tasks = 0
    for j in jobs:
        ji = st.getJobInfo(j)
        if ji is None:
            continue
        for s in ji.stageIds:
            si = st.getStageInfo(s)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
    sc.setJobGroup("idle", "idle")
    spark.catalog.clearCache()
    return dt, len(jobs), n_stages, n_tasks


def main() -> int:
    exp = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session()
    # warmup (bench parity)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    arms: dict[str, list] = {"A": [], "B": []}

    if exp == "minhash_buckets":
        import tidier_spark.operators.dedup as D

        new_impl = D.minhash_candidate_pairs

        def old_impl(df, id_col="doc_id", text_col="text", k=8, bands=4,
                     shingle_n=3, _shingle_df=None):
            # pre-r13 join formulation (commit 353b683)
            from pyspark import StorageLevel
            if k % bands:
                raise ValueError
            r = k // bands
            sigs = D.minhash_signatures(df, id_col, text_col, k, shingle_n,
                                        _shingle_df)
            band_cols = [
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws(",", *[F.col(f"mh_{b * r + i}")
                                             for i in range(r)])).alias("sig"),
                )
                for b in range(bands)
            ]
            banded = (
                sigs.select(F.col(id_col),
                            F.explode(F.array(*band_cols)).alias("bs"))
                .select(id_col, "bs.band", "bs.sig")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            a = banded.alias("a")
            bb = banded.alias("b")
            return (
                a.join(bb, on=["band", "sig"])
                .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                .select(F.col(f"a.{id_col}").alias("id_a"),
                        F.col(f"b.{id_col}").alias("id_b"))
                .distinct()
            )

        entries = ["dup_clusters_star", "pagerank_dups", "dedup_minhash",
                   "dup_clusters", "triangle_count"]
        qs = entry.queries()
        for i in range(reps):
            order = ("A", "B") if i % 2 == 0 else ("B", "A")
            for arm in order:
                D.minhash_candidate_pairs = old_impl if arm == "A" else new_impl
                row = {}
                for e in entries:
                    row[e] = timed(
                        spark,
                        (lambda e=e: qs[e](spark, sf_dir)),
                        f"{exp}-{arm}-{i}-{e}",
                    )
                arms[arm].append(row)
        D.minhash_candidate_pairs = new_impl
        for e in entries:
            a_best = min(r[e][0] for r in arms["A"])
            b_best = min(r[e][0] for r in arms["B"])
            a_cnt = arms["A"][0][e][1:]
            b_cnt = arms["B"][0][e][1:]
            print(f"{e}: A(join) {a_best:.3f}s jobs/stages/tasks={a_cnt} | "
                  f"B(buckets) {b_best:.3f}s {b_cnt} | delta {b_best - a_best:+.3f}")

    elif exp == "tpch_q21":
        import importlib
        sys.path.insert(0, "/tmp/ab_old")
        old_entry = importlib.import_module("old_q21")
        qs = entry.queries()
        for i in range(reps):
            order = ("A", "B") if i % 2 == 0 else ("B", "A")
            for arm in order:
                fn = old_entry.q21_old if arm == "A" else qs["tpch_q21"]
                arms[arm].append(
                    timed(spark, (lambda fn=fn: fn(spark, sf_dir)),
                          f"{exp}-{arm}-{i}")
                )
        for arm in ("A", "B"):
            best = min(r[0] for r in arms[arm])
            print(f"q21 {arm}: min {best:.3f}s  counts {arms[arm][0][1:]}")

    elif exp == "eval_auc":
        from tidier_spark.operators.evalmetrics import auc_exact
        qs = entry.queries()

        def scored(spark):
            from tidier_spark.sources import read_table
            emb = read_table(spark, sf_dir, "embeddings")
            return emb.select(
                F.round(
                    (0.5 + F.col("embedding")[0].cast("double") / 2
                     + F.col("embedding")[1].cast("double") / 4) * 1_000_000
                ).cast("long").alias("score_ppm"),
                F.col("label"),
            )

        for i in range(reps):
            order = ("A", "B") if i % 2 == 0 else ("B", "A")
            for arm in order:
                if arm == "A":
                    thunk = lambda: auc_exact(  # noqa: E731
                        scored(spark), "score_ppm", "label")
                else:
                    thunk = lambda: qs["eval_auc"](spark, sf_dir)  # noqa: E731
                arms[arm].append(timed(spark, thunk, f"{exp}-{arm}-{i}"))
        for arm in ("A", "B"):
            best = min(r[0] for r in arms[arm])
            print(f"eval_auc {arm}: min {best:.3f}s  counts {arms[arm][0][1:]}")
    else:
        raise SystemExit(f"unknown experiment {exp}")

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
