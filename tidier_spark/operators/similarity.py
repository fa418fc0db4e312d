"""Similarity search over embedding columns (array<float>).

Two paths, per the scale brief:

* **Brute-force cosine top-k** — the exact baseline.  All math is built-in
  (``zip_with`` + ``aggregate`` fold in double precision), evaluated
  JVM-side; the pair space is a block-nested-loop join.  Exact and fine up
  to ~10⁵ vectors per side; it is the *re-rank* stage at scale, never the
  first stage.
* **LSH-bucketed top-k** — random-hyperplane signatures shrink the pair
  space to same-bucket collisions before the exact cosine re-rank.  The
  hyperplanes are seeded deterministically from md5, so results are
  reproducible across runs/engines; recall is tunable via
  (n_planes, n_tables).

Determinism: cosine is computed in double precision with a fixed
left-to-right fold (same order DuckDB's list_cosine_similarity uses), and
top-k ordering ties break on the neighbor id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash60

__all__ = [
    "dot",
    "norm",
    "cosine",
    "cosine_topk",
    "lsh_topk",
    "ivf_topk",
    "cosine_topk_sql",
]


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (norm(a) * norm(b))).cast("double")


def unit_vectors(df: DataFrame, id_col: str, vec_col: str, out: str = "__uv") -> DataFrame:
    """Normalize each vector ONCE (double precision).  Downstream cosine is
    then a plain dot — computing norms per *pair* would triple the FLOPs."""
    n = norm(F.col(vec_col))
    return df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / n).alias(out),
    )


def cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    queries: DataFrame | None = None,
    method: str = "numpy",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries`` defaults to ``df`` itself (all-pairs self-search, excluding
    the identity pair).  Output: (query_id, neighbor_id, cos_sim, rank);
    cos_sim is rounded to 6 decimals and ranking ties break on neighbor_id,
    so results are method-independent.

    * ``method="numpy"`` (default): broadcast the candidate matrix to every
      task; stream query rows through an Arrow-batched ``mapInPandas`` doing
      one BLAS matmul + argpartition per batch.  This is the 100 TB shape:
      queries scale out, candidates are a broadcast (chunk the candidate
      side and merge per-chunk top-k when it exceeds executor memory).
    * ``method="sql"``: pure built-in expressions (no Python workers) over a
      crossJoin of pre-normalized vectors — the portable fallback and the
      form the DuckDB oracle mirrors exactly.
    """
    if method == "numpy":
        return _cosine_topk_numpy(df, id_col, vec_col, k, queries)
    q = unit_vectors(queries or df, id_col, vec_col, "__qv").withColumnRenamed(
        id_col, "query_id"
    )
    c = unit_vectors(df, id_col, vec_col, "__cv").withColumnRenamed(
        id_col, "neighbor_id"
    )
    sims = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _cosine_topk_numpy(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    queries: DataFrame | None,
) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    # Candidate side → one broadcast matrix.  collect() here is the
    # documented broadcast boundary: row-count × dims must fit in executor
    # memory; beyond that, chunk candidates and merge per-chunk top-k.
    cand = df.select(id_col, vec_col).toPandas()
    c_ids = cand[id_col].to_numpy()
    c_mat = np.vstack(cand[vec_col].to_numpy()).astype(np.float64)
    c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((c_ids, c_mat))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
            T.StructField("rank", T.LongType()),
        ]
    )

    def topk_batches(it):
        ids, mat = bc.value
        order_by_id = np.argsort(ids, kind="stable")
        for pdf in it:
            q_ids = pdf[id_col].to_numpy()
            q_mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
            sims = np.round(q_mat @ mat.T, 6)  # rounded BEFORE ranking →
            # ordering matches any engine that rounds the same values
            rows: dict[str, list] = {"query_id": [], "neighbor_id": [], "cos_sim": [], "rank": []}
            for qi, qid in enumerate(q_ids):
                s = sims[qi]
                self_mask = ids == qid
                s = np.where(self_mask, -np.inf, s)
                # top-k by (-sim, neighbor_id): stable sort over id-sorted order
                cand_order = order_by_id[np.argsort(-s[order_by_id], kind="stable")][:k]
                for r, ci in enumerate(cand_order, start=1):
                    rows["query_id"].append(int(qid))
                    rows["neighbor_id"].append(int(ids[ci]))
                    rows["cos_sim"].append(float(s[ci]))
                    rows["rank"].append(r)
            yield pd.DataFrame(rows)

    src = (queries or df).select(id_col, vec_col)
    return src.mapInPandas(topk_batches, out_schema)


def _plane_value_py(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1).

    Same definition as :func:`tidier_spark.operators.text.hash60` — first 15
    hex digits of md5 — computed driver-side so signatures don't drag a
    2048-node constant expression tree through Catalyst.
    """
    import hashlib

    h = int(hashlib.md5(f"plane:{plane}:{dim}".encode()).hexdigest()[:15], 16)
    return h / float(2**59) - 1.0


def _plane_matrix(table: int, n_planes: int, n_dims: int):
    import numpy as np

    return np.array(
        [
            [_plane_value_py(table * 1000 + p, d) for d in range(n_dims)]
            for p in range(n_planes)
        ]
    )


def lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 12,
    n_tables: int = 3,
    n_dims: int = 64,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH buckets → exact cosine re-rank.

    Vectors colliding in any of ``n_tables`` signature tables become
    candidate pairs (equi-join on (table, signature) — never a cross join);
    exact cosine + row_number picks the final k.  Deterministic: planes are
    md5-seeded, ties break on neighbor id.  Recall < 1 by construction;
    raise n_tables / lower n_planes to trade cost for recall.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    planes = np.vstack([_plane_matrix(t, n_planes, n_dims) for t in range(n_tables)])
    pow2 = np.array([1 << p for p in range(n_planes)], dtype=np.int64)
    bc_planes = df.sparkSession.sparkContext.broadcast(planes)

    sig_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("tbl", T.IntegerType()),
            T.StructField("sig", T.LongType()),
        ]
    )

    def signatures(it):
        P = bc_planes.value  # (n_tables*n_planes, n_dims)
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            # projection sign is scale-invariant → no need to normalize
            bits = (mat @ P.T) >= 0  # (n, n_tables*n_planes)
            out = {id_col: [], "tbl": [], "sig": []}
            for t in range(n_tables):
                blk = bits[:, t * n_planes : (t + 1) * n_planes]
                sigs = (blk * pow2).sum(axis=1)
                out[id_col].extend(int(v) for v in pdf[id_col])
                out["tbl"].extend([t] * len(pdf))
                out["sig"].extend(int(s) for s in sigs)
            yield pd.DataFrame(out)

    # Candidates carry IDS ONLY — shuffling the vectors through the
    # pair join would move |pairs|·dims·8 bytes; ids are 8 bytes.
    tagged = df.select(id_col, vec_col).mapInPandas(signatures, sig_schema)

    a = tagged.alias("a")
    b = tagged.alias("b")
    cand = (
        a.join(b, on=["tbl", "sig"])
        .where(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias("neighbor_id"),
        )
    )
    # NOTE: no dropDuplicates here — that would be a second full shuffle of
    # the pair stream.  The re-rank repartitions by query_id anyway, which
    # co-locates every copy of a pair; dedupe happens in pandas there.
    return _rerank_pairs_numpy(df, cand, id_col, vec_col, k)


def _rerank_pairs_numpy(
    df: DataFrame, pairs: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Exact cosine + top-k over candidate (query_id, neighbor_id) pairs,
    vectors resolved from a broadcast matrix (no vector shuffle)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    cand = df.select(id_col, vec_col).toPandas()
    ids = cand[id_col].to_numpy()
    mat = np.vstack(cand[vec_col].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    idx = {int(v): i for i, v in enumerate(ids)}
    bc = spark.sparkContext.broadcast((idx, mat))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
            T.StructField("rank", T.LongType()),
        ]
    )

    def rerank(it):
        idx_l, mat_l = bc.value
        # One partition holds every candidate of each query hashed to it
        # (repartition below), but Arrow splits partitions into batches —
        # concat so a query's top-k sees all its candidates.  Id-pairs are
        # 24 B/row; partitions stay tiny even at 10⁸ candidates total.
        batches = [pdf for pdf in it if len(pdf)]
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True)
        # pairs may arrive multiple times (one per colliding LSH table);
        # partition-local dedupe is global because pairs are co-located
        pdf = pdf.drop_duplicates(["query_id", "neighbor_id"], ignore_index=True)
        qi = pdf["query_id"].map(idx_l).to_numpy()
        ni = pdf["neighbor_id"].map(idx_l).to_numpy()
        sims = np.round(np.einsum("ij,ij->i", mat_l[qi], mat_l[ni]), 6)
        out = pd.DataFrame(
            {
                "query_id": pdf["query_id"].astype("int64"),
                "neighbor_id": pdf["neighbor_id"].astype("int64"),
                "cos_sim": sims,
            }
        )
        out = out.sort_values(
            ["query_id", "cos_sim", "neighbor_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out["rank"] = out.groupby("query_id").cumcount() + 1
        yield out[out["rank"] <= k]

    # hash-repartition pairs by query so each query's candidates co-locate
    return (
        pairs.repartition("query_id")
        .mapInPandas(rerank, out_schema)
    )


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 5,
    sample_size: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse k-means quantizer →
    per-list buckets → probe the ``n_probe`` nearest lists per query →
    exact cosine re-rank on probed candidates.

    The quantizer trains driver-side on a deterministic sample (first
    ``sample_size`` rows by id — seeded, reproducible), Lloyd iterations in
    numpy; the centroid matrix broadcasts (n_lists × dims — bytes).
    Assignment and probing are mapInPandas matmuls; the candidate join is
    an equi-join on ``list_id``, so the pair space is Σ_probed-list
    |bucket| per query — n_probe/n_lists of brute force.  Recall rises
    with ``n_probe`` (== n_lists ⇒ exact).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    # deterministic training sample: lowest ids (seeded orderBy-free)
    sample = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .toPandas()
    )
    S = np.vstack(sample[vec_col].to_numpy()).astype(np.float64)
    S /= np.linalg.norm(S, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    cent = S[rng.choice(len(S), size=min(n_lists, len(S)), replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(S @ cent.T, axis=1)  # cosine on unit vectors
        for c in range(len(cent)):
            members = S[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    bc_cent = spark.sparkContext.broadcast(cent)

    # assign every vector to its list (bucket)
    assign_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("list_id", T.IntegerType()),
        ]
    )

    def assign_lists(it):
        C = bc_cent.value
        for pdf in it:
            if not len(pdf):
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "list_id": np.argmax(M @ C.T, axis=1).astype("int32"),
                }
            )

    lists = df.select(id_col, vec_col).mapInPandas(assign_lists, assign_schema)

    # probe: each query fans out to its n_probe nearest lists
    probe_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("list_id", T.IntegerType()),
        ]
    )

    def probe_lists(it):
        C = bc_cent.value
        for pdf in it:
            if not len(pdf):
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            sims = M @ C.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf[id_col].to_numpy().astype("int64"), n_probe),
                    "list_id": top.reshape(-1).astype("int32"),
                }
            )

    probes = df.select(id_col, vec_col).mapInPandas(probe_lists, probe_schema)

    cand = (
        probes.join(lists.withColumnRenamed(id_col, "neighbor_id"), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    return _rerank_pairs_numpy(df, cand, id_col, vec_col, k)


# --- DuckDB mirror ---------------------------------------------------------


def cosine_topk_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> str:
    """Exact top-k mirror.  cos_sim is rounded to 6 decimals BEFORE ranking
    (matching the Spark paths), so tie-breaks on neighbor_id resolve
    identically in both engines regardless of 1-ulp float noise."""
    return f"""
WITH v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS vec FROM {table}),
sims AS (
  SELECT a.{id_col} AS query_id, b.{id_col} AS neighbor_id,
         round(
           list_sum(list_transform(range(1, len(a.vec) + 1),
                                   i -> a.vec[i] * b.vec[i]))
           / (sqrt(list_sum(list_transform(a.vec, x -> x * x)))
              * sqrt(list_sum(list_transform(b.vec, x -> x * x)))), 6) AS cos_sim
  FROM v a, v b WHERE a.{id_col} <> b.{id_col}
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {k}
"""
