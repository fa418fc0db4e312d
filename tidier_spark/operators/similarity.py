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

from .dedup import _fan_out
from .text import hash60

__all__ = [
    "dot",
    "norm",
    "cosine",
    "cosine_topk",
    "lsh_topk",
    "ivf_topk",
    "train_quantizer",
    "train_pq_codebooks",
    "pq_encode",
    "pq_topk",
    "ivfpq_topk",
    "kmeans_fit",
    "kmeans_fit_sql",
    "label_centroids",
    "label_centroids_sql",
    "assign_clusters",
    "cosine_topk_sql",
    "nonzero_vectors",
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


def nonzero_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Drop zero-norm (and NULL) vectors — cosine similarity is UNDEFINED
    for them (0/0), so every cosine-metric operator excludes them from
    both the corpus and the query side, the way SQL aggregates drop
    NULLs.  The alternatives are worse at 100 TB: raising kills a
    petabyte job over one broken encoder output, and letting NaN flow
    makes ranking order engine-dependent (numpy drops NaN from top-k
    where SQL ORDER BY sorts it first).  JVM-side column expression —
    one codegen'd pass, no Python.  The DuckDB oracle mirrors apply the
    same ``list_sum(x*x) > 0`` predicate (zerovec edge axis,
    docs/EDGE_SWEEP.md).
    """
    ssq = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.where(ssq > 0)


def unit_vectors(df: DataFrame, id_col: str, vec_col: str, out: str = "__uv") -> DataFrame:
    """Normalize each vector ONCE (double precision).  Downstream cosine is
    then a plain dot — computing norms per *pair* would triple the FLOPs."""
    n = norm(F.col(vec_col))
    return df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / n).alias(out),
    )


def _check_topk_params(fn: str, **params: int) -> None:
    """Named bound checks for the ANN family: k >= 0 (k=0 is the documented
    empty search — useful in generated pipelines), every structural
    parameter >= 1.  Without these the failure modes are a numpy
    "argmax of an empty sequence" (n_lists=0), an empty-projection Python
    worker crash (n_planes=0), or — worst — k<0 silently returning EVERY
    pair (a negative rank bound inverts the cut)."""
    k = params.pop("k", None)
    if k is not None and k < 0:
        raise ValueError(f"{fn}: k must be >= 0, got {k}")
    for name, v in params.items():
        if v < 1:
            raise ValueError(f"{fn}: {name} must be >= 1, got {v}")


def cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    queries: DataFrame | None = None,
    method: str = "numpy",
    chunk_size: int = 1 << 16,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries`` defaults to ``df`` itself (all-pairs self-search, excluding
    the identity pair).  Output: (query_id, neighbor_id, cos_sim, rank);
    cos_sim is rounded to 6 decimals and ranking ties break on neighbor_id,
    so results are method-independent.

    * ``method="numpy"`` (default): stream query rows through an
      Arrow-batched ``mapInPandas`` doing one BLAS matmul + stable
      top-k per batch against the candidate matrix, which is broadcast in
      bounded CHUNKS (``chunk_size`` rows each): per-chunk partial top-k,
      then a window merge.  Driver and executor memory are bounded by
      chunk_size × dims regardless of candidate count — the 100 TB shape
      for an exact (inherently O(n·m)) search.
    * ``method="sql"``: pure built-in expressions (no Python workers) over a
      crossJoin of pre-normalized vectors — the portable fallback and the
      form the DuckDB oracle mirrors exactly.
    """
    _check_topk_params("cosine_topk", k=k, chunk_size=chunk_size)
    df = nonzero_vectors(df, vec_col)
    if queries is not None:
        queries = nonzero_vectors(queries, vec_col)
    if method == "numpy":
        return _cosine_topk_blas(df, id_col, vec_col, k, queries, chunk_size)
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


def _cosine_topk_blas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    queries: DataFrame | None,
    chunk_size: int,
) -> DataFrame:
    """Exact BLAS top-k, two shapes by candidate count:

    * candidates fit one chunk (≤ ``chunk_size``): broadcast the candidate
      matrix once and stream query batches through a ``mapInPandas``
      matmul — the classic broadcast-dim shape (one bounded driver pull,
      same as a broadcast hash join's build side).
    * larger: fully EXECUTOR-SIDE grid plan (:func:`_cosine_topk_grid`) —
      both sides hash into blocks, each (query-block, candidate-block)
      grid cell is one ``applyInPandas`` group running one matmul, and a
      window merges per-cell partial top-ks.  No driver serialization
      point at any size (the round-2 driver-pump chunk loop is gone).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    cand_src = df.select(id_col, vec_col)
    n = cand_src.count()
    if n > chunk_size:
        return _cosine_topk_grid(
            df, id_col, vec_col, k, queries, chunk_size, n_cand=n
        )

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
            T.StructField("rank", T.LongType()),
        ]
    )
    # single-file scans arrive as ONE input split — fan the query side out
    # so the matmul batches use every core, not one
    src = _fan_out((queries or df).select(id_col, vec_col))

    def chunk_topk(bc):
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
                    # k >= n_candidates: the -inf-masked self slot would
                    # otherwise leak as a bogus pair (grid path filters it)
                    cand_order = cand_order[s[cand_order] > -np.inf]
                    for r, ci in enumerate(cand_order, start=1):
                        rows["query_id"].append(int(qid))
                        rows["neighbor_id"].append(int(ids[ci]))
                        rows["cos_sim"].append(float(s[ci]))
                        rows["rank"].append(r)
                yield pd.DataFrame(rows)

        return topk_batches

    pdf = cand_src.toPandas()
    if len(pdf) == 0:
        # empty corpus: top-k over nothing is well-defined — zero pairs
        # (matches the brute-force SQL oracle, which also yields none)
        return spark.createDataFrame([], out_schema)
    c_ids = pdf[id_col].to_numpy()
    c_mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((c_ids, c_mat))
    return src.mapInPandas(chunk_topk(bc), out_schema)


def _grid_sides(
    df: DataFrame,
    queries: DataFrame | None,
    id_col: str,
    vec_col: str,
    n_q_blocks: int,
    n_c_blocks: int,
) -> DataFrame:
    """Tagged union for the executor-side all-pairs grid: every query row
    is replicated to each candidate block, every candidate row to each
    query block, so each unordered (query, candidate) combination lands
    in EXACTLY ONE (qa, cb) group.  Shuffle volume is
    |Q|·n_c_blocks + |C|·n_q_blocks vector rows — the classic √P grid
    replication bound — and nothing ever touches the driver."""
    q_src = (queries if queries is not None else df).select(id_col, vec_col)
    c_src = df.select(id_col, vec_col)
    cbs = F.array([F.lit(i) for i in range(n_c_blocks)])
    qas = F.array([F.lit(i) for i in range(n_q_blocks)])
    q_side = q_src.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_q_blocks)).cast("int").alias("qa"),
        F.explode(cbs).alias("cb"),
        F.lit(0).alias("side"),
        F.col(id_col).alias("gid"),
        F.col(vec_col).cast("array<double>").alias("gvec"),
    )
    c_side = c_src.select(
        F.explode(qas).alias("qa"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_c_blocks)).cast("int").alias("cb"),
        F.lit(1).alias("side"),
        F.col(id_col).alias("gid"),
        F.col(vec_col).cast("array<double>").alias("gvec"),
    )
    return q_side.unionByName(c_side)


def _cosine_topk_grid(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    queries: DataFrame | None,
    chunk_size: int,
    n_cand: int,
) -> DataFrame:
    """Exact top-k as a block-partitioned grid join — the 100 TB shape for
    an inherently O(n·m) search.  Queries hash into A blocks, candidates
    into B blocks (each ≤ ~chunk_size rows); every (qa, cb) cell is one
    ``applyInPandas`` group running one matmul and emitting its queries'
    k best cell-candidates; a window over the cell partials (candidate
    blocks partition disjointly, so no pair repeats) picks the global k.
    All data flows executor→executor; the driver only plans."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    q_src = (queries if queries is not None else df).select(id_col, vec_col)
    n_q = n_cand if queries is None else q_src.count()
    A = max(1, math.ceil(n_q / chunk_size))
    B = max(1, math.ceil(n_cand / chunk_size))
    grid = _grid_sides(df, queries, id_col, vec_col, A, B)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def cell_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        qm = pdf["side"].to_numpy() == 0
        cm = ~qm
        if not qm.any() or not cm.any():
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos_sim": []})
        q_ids = pdf["gid"].to_numpy()[qm]
        c_ids = pdf["gid"].to_numpy()[cm]
        Q = np.vstack(pdf["gvec"].to_numpy()[qm]).astype(np.float64)
        C = np.vstack(pdf["gvec"].to_numpy()[cm]).astype(np.float64)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        C /= np.linalg.norm(C, axis=1, keepdims=True)
        S = np.round(Q @ C.T, 6)
        order_by_id = np.argsort(c_ids, kind="stable")
        kk = min(k, len(c_ids))
        rows: dict[str, list] = {"query_id": [], "neighbor_id": [], "cos_sim": []}
        for i, qid in enumerate(q_ids):
            s = np.where(c_ids == qid, -np.inf, S[i])
            best = order_by_id[np.argsort(-s[order_by_id], kind="stable")][:kk]
            best = best[s[best] > -np.inf]
            rows["query_id"].extend([int(qid)] * len(best))
            rows["neighbor_id"].extend(int(c_ids[j]) for j in best)
            rows["cos_sim"].extend(float(s[j]) for j in best)
        return pd.DataFrame(rows)

    partials = grid.groupBy("qa", "cb").applyInPandas(cell_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        partials.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


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


def _lsh_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    n_tables: int,
    n_dims: int,
    carry_vec: bool = False,
) -> DataFrame:
    """(id, tbl, sig[, vec]) hyperplane-LSH signature rows — one Arrow
    matmul pass against the broadcast plane matrix, one output row per
    (vector, table).  With ``carry_vec`` the vector rides along into the
    bucket shuffle (×n_tables duplication — the standard multi-table LSH
    trade) so bucket-local scoring needs no join back to the table."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    planes = np.vstack([_plane_matrix(t, n_planes, n_dims) for t in range(n_tables)])
    pow2 = np.array([1 << p for p in range(n_planes)], dtype=np.int64)
    bc_planes = df.sparkSession.sparkContext.broadcast(planes)

    fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField("tbl", T.IntegerType()),
        T.StructField("sig", T.LongType()),
    ]
    if carry_vec:
        fields.append(T.StructField("__vec", T.ArrayType(T.DoubleType())))
    sig_schema = T.StructType(fields)

    def signatures(it):
        P = bc_planes.value  # (n_tables*n_planes, n_dims)
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            # projection sign is scale-invariant → no need to normalize
            bits = (mat @ P.T) >= 0  # (n, n_tables*n_planes)
            n = len(pdf)
            frames = []
            for t in range(n_tables):
                blk = bits[:, t * n_planes : (t + 1) * n_planes]
                out = {
                    id_col: pdf[id_col].astype("int64"),
                    "tbl": np.full(n, t, dtype=np.int32),
                    "sig": (blk * pow2).sum(axis=1),
                }
                if carry_vec:
                    out["__vec"] = pdf[vec_col]
                frames.append(pd.DataFrame(out))
            yield pd.concat(frames, ignore_index=True)

    # _fan_out: a single-file scan is one input split — without it the
    # signature matmul serializes on one core (measured 3.2s → 0.9s for
    # the sf0.1 candidate stage).
    return _fan_out(df.select(id_col, vec_col)).mapInPandas(signatures, sig_schema)


def _lsh_candidates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    n_tables: int,
    n_dims: int,
) -> DataFrame:
    """Hyperplane-LSH candidate pairs: vectors colliding in any of
    ``n_tables`` signature tables (equi-join on (table, signature) — never
    a cross join).  Output (query_id, neighbor_id), possibly repeated once
    per colliding table.  Candidates carry IDS ONLY — shuffling vectors
    through the pair join would move |pairs|·dims·8 bytes; ids are 8 B.

    Id-only candidate streams pair with :func:`_score_pairs` (join-based
    rerank).  For pair-DENSE regimes prefer the bucket-local matmul shape
    (:func:`lsh_topk`, `dedup.embedding_near_dup_lsh`) — scoring inside
    the bucket avoids materializing the pair join entirely."""
    from pyspark import StorageLevel

    # both sides of the self-join read the signature frame: without
    # persist the Arrow signature pipeline runs twice (the same
    # double-compute minhash banding avoids by persisting its bands).
    tagged = _lsh_signatures(
        df, id_col, vec_col, n_planes, n_tables, n_dims
    ).persist(StorageLevel.MEMORY_AND_DISK)

    a = tagged.alias("a")
    b = tagged.alias("b")
    return (
        a.join(b, on=["tbl", "sig"])
        .where(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias("neighbor_id"),
        )
    )


def _bucket_topk_partials(
    bucketed: DataFrame, id_col: str, k: int, bucket_cols: list[str]
) -> DataFrame:
    """Per-bucket exact-cosine partial top-k: one BLAS matmul per bucket
    group (``groupBy(bucket_cols).applyInPandas``), emitting each member's
    k best same-bucket neighbors.  Global top-k over the union of buckets
    == top-k over merged per-bucket top-ks (each candidate scores
    identically wherever it collides), so the caller just dedups and
    windows.  Scoring never materializes a pair join: the pair space
    lives only inside the bucket matmul."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos_sim": []})
        ids = pdf[id_col].to_numpy().astype(np.int64)
        M = np.vstack(pdf["__vec"].to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        S = np.round(M @ M.T, 6)
        # vectorized per-query top-k (r8: replaces a per-row Python
        # argsort loop; same exclusion of self-and-id-duplicates, same
        # (score desc, id asc) tie-break via the id-ordered stable sort)
        order_by_id = np.argsort(ids, kind="stable")
        kk = min(k, n - 1)
        ids_ord = ids[order_by_id]
        SO = S[:, order_by_id]
        SO = np.where(ids_ord[None, :] == ids[:, None], -np.inf, SO)
        idx = np.argsort(-SO, axis=1, kind="stable")[:, :kk]
        vals = np.take_along_axis(SO, idx, axis=1)
        keep = (vals > -np.inf).ravel()
        return pd.DataFrame(
            {
                "query_id": np.repeat(ids, kk)[keep],
                "neighbor_id": ids_ord[idx].ravel()[keep],
                "cos_sim": vals.ravel()[keep],
            }
        )

    return bucketed.groupBy(*bucket_cols).applyInPandas(bucket_topk, out_schema)


def lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 12,
    n_tables: int = 3,
    n_dims: int = 64,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH buckets → bucket-local exact
    cosine partial top-k → global merge.

    Vectors ride into their (table, signature) buckets (×n_tables
    duplication — the multi-table LSH trade); each bucket runs ONE BLAS
    matmul emitting its members' k best bucket-neighbors; a window over
    the deduped union picks the final k.  No pair join is ever
    materialized — in pair-dense regimes (coarse planes / high collision
    rates) the join-based rerank shuffles |pairs| rows through two joins,
    while this shape's cost is Σ_bucket |b|² BLAS flops.  Deterministic:
    planes are md5-seeded, cosine rounded to 6 before ranking, ties break
    on neighbor id.  Recall < 1 by construction; raise n_tables / lower
    n_planes to trade cost for recall.
    """
    _check_topk_params(
        "lsh_topk", k=k, n_planes=n_planes, n_tables=n_tables, n_dims=n_dims
    )
    from pyspark.sql import Window

    sigs = _lsh_signatures(
        nonzero_vectors(df, vec_col),
        id_col, vec_col, n_planes, n_tables, n_dims, carry_vec=True,
    )
    partials = _bucket_topk_partials(sigs, id_col, k, ["tbl", "sig"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        partials.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _score_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    vec_col: str,
    pairs_unique: bool = False,
) -> DataFrame:
    """Exact cosine over candidate (query_id, neighbor_id) pairs with
    vectors resolved by TWO SHUFFLE JOINS against the (id, vector) table —
    the standard rerank-by-join shape.  No driver collect, no full-matrix
    broadcast: the vector table shuffles by id (each partition bounded),
    candidate ids are 16 B/row.  Scoring is an Arrow-batched einsum over
    the joined rows.

    Pairs arriving multiple times (one per colliding LSH table) are
    deduped first — one shuffle of bare id-pairs — so downstream ranking
    sees each pair once.  ``pairs_unique=True`` skips that shuffle for
    callers whose candidate generation is provably duplicate-free
    (inverted-file probing: a neighbor belongs to exactly ONE home list,
    so a (query, neighbor) pair can arise in at most one probed list —
    IVF/IVF-PQ pass this; multi-table LSH must not).

    Scoring itself is the built-in ``cosine`` fold (whole-stage codegen):
    once the pair join has already resolved both vectors into the row, a
    64-dim JVM fold per row beats shipping ~1 KB/row through an Arrow
    batch to a Python worker and back — the batch-matmul shape only wins
    when one side is a shared broadcast matrix (``cosine_topk``'s chunk
    path), not for per-row pair scoring.
    """
    vecs = unit_vectors(df, id_col, vec_col, "__uv")
    if not pairs_unique:
        pairs = pairs.dropDuplicates(["query_id", "neighbor_id"])
    return (
        pairs.join(
            vecs.select(F.col(id_col).alias("query_id"), F.col("__uv").alias("__qv")),
            "query_id",
        )
        .join(
            vecs.select(
                F.col(id_col).alias("neighbor_id"), F.col("__uv").alias("__nv")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("__qv"), F.col("__nv")), 6).alias("cos_sim"),
        )
    )


def _rerank_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    pairs_unique: bool = False,
) -> DataFrame:
    """Join-resolved exact-cosine scoring + per-query top-k window."""
    from pyspark.sql import Window

    scored = _score_pairs(df, pairs, id_col, vec_col, pairs_unique=pairs_unique)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _training_sample(df: DataFrame, id_col: str, vec_col: str, sample_size: int):
    """Deterministic bounded training sample: first ``sample_size`` rows by
    id (TakeOrderedAndProject — one job, no full sort).  Shared by the
    quantizer/codebook trainers so multi-artifact indexes (IVF-PQ) pay for
    one collection instead of one per artifact.  If the returned frame has
    fewer than ``sample_size`` rows the corpus is exhausted — callers can
    use ``len(sample)`` as an exact corpus count without a second job.

    An EMPTY corpus raises loudly here (all index trainers route through
    this): training a quantizer/codebook on zero vectors is undefined,
    and the numpy stack downstream would otherwise die with an opaque
    "need at least one array to concatenate"."""
    sample = (
        df.select(id_col, vec_col).orderBy(id_col).limit(sample_size).toPandas()
    )
    if len(sample) == 0:
        raise ValueError(
            "cannot train on an empty corpus: no vectors in input"
        )
    return sample


def train_quantizer(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_lists: int,
    kmeans_iters: int = 5,
    sample_size: int = 4096,
    seed: int = 42,
    _sample=None,
):
    """Coarse k-means quantizer trained driver-side on a deterministic
    bounded sample (first ``sample_size`` rows by id — reproducible, no
    full-table collect).  Lloyd iterations over unit vectors (spherical
    k-means); returns the (n_lists × dims) centroid matrix — bytes to
    broadcast regardless of table size.  ``_sample`` lets callers pass a
    pre-collected ``_training_sample`` frame (same first-rows contract) to
    share one collection across trainers."""
    _check_topk_params("train_quantizer", n_lists=n_lists)
    import numpy as np

    sample = (
        _training_sample(df, id_col, vec_col, sample_size)
        if _sample is None
        else _sample
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
    return cent


def assign_clusters(df: DataFrame, id_col: str, vec_col: str, bc_cent) -> DataFrame:
    """(id, list_id) nearest-centroid assignment — an Arrow-batched
    mapInPandas matmul against the broadcast centroid matrix."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

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

    return _fan_out(df.select(id_col, vec_col)).mapInPandas(
        assign_lists, assign_schema
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
    numpy; the centroid matrix broadcasts (n_lists × dims — bytes).  ONE
    fused mapInPandas matmul emits each vector's n_probe nearest lists
    ranked (rank 1 IS the inverted-file assignment), with the vector
    riding along; each list group then runs ONE BLAS matmul — probing
    queries × member rows — emitting per-query partial top-k, and a
    window over the deduped union picks the final k.  The pair space
    (Σ_probed-list |bucket| per query — n_probe/n_lists of brute force)
    lives only inside the bucket matmuls; no pair join materializes.
    Recall rises with ``n_probe`` (== n_lists ⇒ exact).
    """
    _check_topk_params("ivf_topk", k=k, n_lists=n_lists, n_probe=n_probe)
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    df = nonzero_vectors(df, vec_col)
    spark = df.sparkSession
    cent = train_quantizer(
        df,
        id_col,
        vec_col,
        n_lists=n_lists,
        kmeans_iters=kmeans_iters,
        sample_size=sample_size,
        seed=seed,
    )
    # a corpus smaller than n_lists trains fewer centroids than asked —
    # probing more lists than exist would misalign the fan-out arrays
    # (the ivfpq clamp, mirrored here)
    n_probe = min(n_probe, len(cent))
    bc_cent = spark.sparkContext.broadcast(cent)

    probe_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("probe_rank", T.IntegerType()),
            T.StructField("__vec", T.ArrayType(T.DoubleType())),
        ]
    )

    def probe_lists(it):
        C = bc_cent.value
        ranks = np.arange(1, n_probe + 1, dtype=np.int32)
        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            sims = M @ C.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy().astype("int64"), n_probe),
                    "list_id": top.reshape(-1).astype("int32"),
                    "probe_rank": np.tile(ranks, n),
                    "__vec": pdf[vec_col].repeat(n_probe).reset_index(drop=True),
                }
            )

    probed = _fan_out(df.select(id_col, vec_col)).mapInPandas(
        probe_lists, probe_schema
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def list_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        # every row probes this list; rows with probe_rank == 1 are members
        ids = pdf[id_col].to_numpy().astype(np.int64)
        members = (pdf["probe_rank"] == 1).to_numpy()
        if not members.any() or len(pdf) < 2:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos_sim": []})
        M = np.vstack(pdf["__vec"].to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        m_ids = ids[members]
        S = np.round(M @ M[members].T, 6)  # (queries × members)
        # vectorized per-query top-k (r8: same loop replacement as the
        # LSH bucket — self excluded, (score desc, id asc) tie-break)
        order_by_id = np.argsort(m_ids, kind="stable")
        ids_ord = m_ids[order_by_id]
        SO = S[:, order_by_id]
        SO = np.where(ids_ord[None, :] == ids[:, None], -np.inf, SO)
        kk = min(k, SO.shape[1])
        idx = np.argsort(-SO, axis=1, kind="stable")[:, :kk]
        vals = np.take_along_axis(SO, idx, axis=1)
        keep = (vals > -np.inf).ravel()
        return pd.DataFrame(
            {
                "query_id": np.repeat(ids, kk)[keep],
                "neighbor_id": ids_ord[idx].ravel()[keep],
                "cos_sim": vals.ravel()[keep],
            }
        )

    partials = probed.groupBy("list_id").applyInPandas(list_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    # no pair dedup: members carry probe_rank==1 only, so a neighbor is
    # scored in exactly one (its home) list per query
    return (
        partials
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )



def train_pq_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    m: int = 8,
    n_codes: int = 32,
    kmeans_iters: int = 8,
    sample_size: int = 4096,
    seed: int = 42,
    _sample=None,
):
    """Product-quantization codebooks (FAISS-PQ shape): split each UNIT
    vector into ``m`` subspaces and run Lloyd k-means per subspace on a
    deterministic bounded sample (first ``sample_size`` rows by id — the
    same reproducible-training contract as :func:`train_quantizer`;
    ``_sample`` shares a pre-collected frame across trainers).

    Returns an (m × n_codes × d/m) float64 array — kilobytes to broadcast
    regardless of table size.  Ties in assignment resolve to the lowest
    code index (np.argmin), so encoding is bit-deterministic.
    """
    import numpy as np

    sample = (
        _training_sample(df, id_col, vec_col, sample_size)
        if _sample is None
        else _sample
    )
    S = np.vstack(sample[vec_col].to_numpy()).astype(np.float64)
    S /= np.linalg.norm(S, axis=1, keepdims=True)
    d = S.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, min(n_codes, len(S)), ds))
    for s in range(m):
        sub = S[:, s * ds : (s + 1) * ds]
        cent = sub[rng.choice(len(sub), size=books.shape[1], replace=False)]
        for _ in range(kmeans_iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s] = cent
    return books


def pq_encode(df: DataFrame, id_col: str, vec_col: str, bc_books) -> DataFrame:
    """(id, codes) PQ encoding — Arrow-batched mapInPandas nearest-code
    assignment per subspace against the broadcast codebooks.  The output
    is the compressed table: ``m`` small ints per vector (d·4 bytes →
    m bytes at int8 storage), the representation that makes a 100 TB
    vector corpus broadcastable / cacheable."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(it):
        B = bc_books.value  # (m, n_codes, ds)
        m, _, ds = B.shape
        for pdf in it:
            if not len(pdf):
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            codes = np.empty((len(M), m), dtype=np.int32)
            for s in range(m):
                sub = M[:, s * ds : (s + 1) * ds]
                d2 = ((sub[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "codes": list(codes),
                }
            )

    return _fan_out(df.select(id_col, vec_col)).mapInPandas(encode, schema)


def pq_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    m: int = 8,
    n_codes: int = 32,
    kmeans_iters: int = 8,
    sample_size: int = 4096,
    seed: int = 42,
    shortlist: int | None = None,
    max_corpus_rows: int = 20_000_000,
) -> DataFrame:
    """Product-quantization approximate top-k (asymmetric distance
    computation, the FAISS-PQ idiom): queries stay full-precision, the
    database side is the ``m``-byte code table, and each query scores the
    whole corpus through an (m × n_codes) inner-product LOOKUP TABLE —
    one small matmul per query batch plus a gather-sum, no full-precision
    pair dot products.

    Scale story: the compressed table is d·4/m× smaller than the raw
    vectors (64-dim float → 8 codes ≈ 32×), which is exactly what makes
    the "broadcast the database" strategy survive corpus sizes where raw
    vectors cannot.  Be explicit about the boundary: the code table IS
    collected to the driver once and broadcast (that is the FAISS-PQ
    single-index contract — a RAM-resident compressed index), so this
    path is bounded by driver/executor memory at corpus·(8+m) bytes ≈
    raw/32; beyond that, use :func:`ivfpq_topk`, where the SAME encoding
    and scoring kernel run bucket-local with no corpus-sized collect or
    broadcast anywhere.  That boundary is ENFORCED, not advisory:
    ``max_corpus_rows`` (default 20M ≈ 320 MB of codes at m=8) is
    checked with one column-pruned count before anything is collected,
    and a larger corpus raises with the ivfpq_topk routing in the
    message.  Scoring is embarrassingly parallel over query
    partitions; nothing shuffles after the one encode pass.

    With ``shortlist=K'`` the PQ pass emits K' candidates per query and a
    join-resolved EXACT cosine re-rank picks the final k — the standard
    ADC+re-rank pipeline: full-precision vectors are touched for only
    K'·n_queries pairs instead of n², and recall jumps because the true
    top-k only has to survive into the shortlist, not win the quantized
    ordering outright.

    Determinism: seeded sampling, ties to the lowest code / neighbor id,
    scores rounded to 6 decimals before ranking — same contract as the
    other ANN paths.  Approximate by construction; the entry carries a
    recall guarantee row and pytest holds the recall differential.
    """
    _check_topk_params(
        "pq_topk", k=k, m=m, n_codes=n_codes,
        **({} if shortlist is None else {"shortlist": shortlist}),
    )
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    df = nonzero_vectors(df, vec_col)
    spark = df.sparkSession
    # One bounded collection feeds training AND, when it exhausts the
    # corpus (len(sample) < sample_size ⇒ the corpus has exactly that many
    # rows), doubles as the corpus itself — the count() guard job and the
    # distributed encode pass are then pure overhead and are skipped.  At
    # real scale (corpus > sample_size) both run as before.
    sample = _training_sample(df, id_col, vec_col, sample_size)
    n_corpus = len(sample) if len(sample) < sample_size else df.count()
    if n_corpus > max_corpus_rows:
        raise ValueError(
            f"pq_topk collects the {8 + m}-byte-per-row code table to the "
            f"driver (FAISS single-index contract); corpus has "
            f"{n_corpus:,} rows > max_corpus_rows={max_corpus_rows:,}. "
            "Use ivfpq_topk — the same encoding and LUT scoring run "
            "bucket-local with no corpus-sized collect or broadcast — "
            "or raise max_corpus_rows explicitly if the driver has the "
            "RAM."
        )
    books = train_pq_codebooks(
        df,
        id_col,
        vec_col,
        m=m,
        n_codes=n_codes,
        kmeans_iters=kmeans_iters,
        sample_size=sample_size,
        seed=seed,
        _sample=sample,
    )
    bc_books = spark.sparkContext.broadcast(books)
    unit_corpus = None
    if n_corpus <= len(sample):
        # the training sample IS the corpus: encode driver-side with the
        # identical argmin assignment (bit-equal to pq_encode — pinned by
        # test_pq_driver_encode_matches_distributed)
        db_ids = sample[id_col].to_numpy().astype(np.int64)
        M = np.vstack(sample[vec_col].to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        unit_corpus = M
        ds = M.shape[1] // m
        codes_mat = np.empty((len(M), m), dtype=np.int32)
        for s in range(m):
            sub = M[:, s * ds : (s + 1) * ds]
            d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            codes_mat[:, s] = np.argmin(d2, axis=1)
    else:
        enc = pq_encode(df, id_col, vec_col, bc_books).toPandas()
        codes_mat = np.vstack(enc["codes"].to_numpy()).astype(np.int32)
        db_ids = enc[id_col].to_numpy().astype(np.int64)
    order = np.argsort(db_ids, kind="stable")
    bc_db = spark.sparkContext.broadcast((db_ids[order], codes_mat[order]))
    if unit_corpus is not None:
        unit_corpus = unit_corpus[order]

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("pq_sim", T.DoubleType()),
        ]
    )

    n_cand = shortlist if shortlist else k

    if shortlist and unit_corpus is not None:
        # Driver-resident corpus + shortlist: fuse the exact re-rank into
        # the scoring pass.  The join-resolved _rerank_pairs shape exists
        # to avoid materializing full-precision vectors per pair at scale;
        # here the full-precision matrix is ALREADY on the driver (it is
        # the training sample), so the per-query exact cosine over the
        # shortlist is a (n_cand × d) matmul in the same UDF — the scored
        # shuffle, pair dedup, two joins, and rank window all collapse
        # into one map-only stage.  Semantics are pinned identical: same
        # 6-decimal rounding, ties sim-desc then neighbor-id-asc
        # (test_pq_full_shortlist_is_exact holds over this path).
        bc_full = spark.sparkContext.broadcast(unit_corpus)
        rerank_schema = T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("neighbor_id", T.LongType()),
                T.StructField("cos_sim", T.DoubleType()),
                T.StructField("rank", T.LongType()),
            ]
        )

        def score_rerank(it):
            B = bc_books.value
            ids, codes = bc_db.value
            V = bc_full.value
            mm, _, ds = B.shape
            for pdf in it:
                nq = len(pdf)
                if not nq:
                    continue
                Q = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                Q /= np.linalg.norm(Q, axis=1, keepdims=True)
                lut = np.einsum(
                    "qsd,scd->qsc", Q.reshape(nq, mm, ds), B, optimize=True
                )
                sims = np.zeros((nq, len(ids)))
                for s in range(mm):
                    sims += lut[:, s, codes[:, s]]
                sims = np.round(sims, 6)
                q_ids = pdf[id_col].to_numpy().astype(np.int64)
                # vectorized shortlist + exact refine (r8: replaces a
                # per-row Python argsort/lexsort loop; identical
                # candidate sets and tie-breaks — PQ ties break on
                # corpus-array position as before, exact ties on
                # (score desc, neighbor id asc) via the row lexsort)
                SM = np.where(ids[None, :] == q_ids[:, None], -np.inf, sims)
                take = min(n_cand, SM.shape[1])
                idx = np.argsort(-SM, axis=1, kind="stable")[:, :take]
                vals = np.take_along_axis(SM, idx, axis=1)
                exact = np.round(
                    np.einsum("qtd,qd->qt", V[idx], Q, optimize=True), 6
                )
                exact = np.where(vals > -np.inf, exact, -np.inf)
                nb = ids[idx]
                kk = min(k, take)
                top = np.lexsort((nb, -exact))[:, :kk]
                tvals = np.take_along_axis(exact, top, axis=1)
                keep = (tvals > -np.inf).ravel()
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(q_ids, kk)[keep],
                        "neighbor_id": np.take_along_axis(
                            nb, top, axis=1
                        ).ravel()[keep],
                        "cos_sim": tvals.ravel()[keep],
                        "rank": np.tile(
                            np.arange(1, kk + 1, dtype=np.int64), nq
                        )[keep],
                    }
                )

        return _fan_out(df.select(id_col, vec_col)).mapInPandas(
            score_rerank, rerank_schema
        )

    def score(it):
        B = bc_books.value
        ids, codes = bc_db.value
        mm, _, ds = B.shape
        for pdf in it:
            nq = len(pdf)
            if not nq:
                continue
            Q = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            Q /= np.linalg.norm(Q, axis=1, keepdims=True)
            # LUT[q, s, c] = <Q[q] subspace s, codeword c>
            lut = np.einsum(
                "qsd,scd->qsc", Q.reshape(nq, mm, ds), B, optimize=True
            )
            sims = np.zeros((nq, len(ids)))
            for s in range(mm):
                sims += lut[:, s, codes[:, s]]
            sims = np.round(sims, 6)
            q_ids = pdf[id_col].to_numpy().astype(np.int64)
            # vectorized candidate emission (r8; same per-row loop
            # replacement as score_rerank — tie-breaks unchanged)
            SM = np.where(ids[None, :] == q_ids[:, None], -np.inf, sims)
            take = min(n_cand, SM.shape[1])
            idx = np.argsort(-SM, axis=1, kind="stable")[:, :take]
            vals = np.take_along_axis(SM, idx, axis=1)
            keep = (vals > -np.inf).ravel()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, take)[keep],
                    "neighbor_id": ids[idx].ravel()[keep],
                    "pq_sim": vals.ravel()[keep],
                }
            )

    scored = _fan_out(df.select(id_col, vec_col)).mapInPandas(score, out_schema)
    if shortlist:
        # one global scoring pass emits each (query, neighbor) at most
        # once -> the rerank skips the defensive pair-dedup shuffle
        return _rerank_pairs(
            df,
            scored.select("query_id", "neighbor_id"),
            id_col,
            vec_col,
            k,
            pairs_unique=True,
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("query_id", "neighbor_id", "pq_sim", "rank")


def ivfpq_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 8,
    m: int = 8,
    n_codes: int = 32,
    shortlist: int = 32,
    kmeans_iters: int = 5,
    sample_size: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ (the FAISS ``IVFx,PQy`` index, the billion-scale workhorse):
    coarse k-means routes vectors into inverted lists, vectors are stored
    as ``m``-byte PQ codes, queries probe ``n_probe`` lists and score each
    probed list's CODES through a per-query lookup table, and an exact
    join-based re-rank resolves the final k from the shortlist.

    Why this is THE 100 TB shape (vs :func:`pq_topk`'s broadcast): nothing
    is collected or broadcast except the two trained artifacts (centroids
    + codebooks — kilobytes).  The code table lives distributed, bucketed
    by list id; each bucket's scoring is a LUT gather over only that
    bucket's codes (n_probe/n_lists of the corpus per query, at m bytes
    per vector); the only full-precision pair work is the
    shortlist·n_queries re-rank join.  Every stage is an equi-join or
    groupBy on list_id / vector id — co-partitioned, skew-bounded by
    balanced k-means lists.

    Determinism matches the other ANN paths (seeded training, stable ties,
    6-decimal rounding before ranking).  Recall rises with ``n_probe`` and
    ``shortlist``; the entry carries a recall guarantee row.
    """
    _check_topk_params(
        "ivfpq_topk", k=k, n_lists=n_lists, n_probe=n_probe, m=m,
        n_codes=n_codes, shortlist=shortlist,
    )
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    df = nonzero_vectors(df, vec_col)
    spark = df.sparkSession
    sample = _training_sample(df, id_col, vec_col, sample_size)
    cent = train_quantizer(
        df, id_col, vec_col, n_lists=n_lists,
        kmeans_iters=kmeans_iters, sample_size=sample_size, seed=seed,
        _sample=sample,
    )
    books = train_pq_codebooks(
        df, id_col, vec_col, m=m, n_codes=n_codes,
        kmeans_iters=kmeans_iters, sample_size=sample_size, seed=seed + 1,
        _sample=sample,
    )
    # a small training sample can yield fewer centroids than n_lists;
    # probing more lists than exist would mis-shape the route() arrays
    n_probe = min(n_probe, len(cent))
    bc_cent = spark.sparkContext.broadcast(cent)
    bc_books = spark.sparkContext.broadcast(books)

    member_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("probe_rank", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("__vec", T.ArrayType(T.DoubleType())),
        ]
    )

    def route(it):
        C = bc_cent.value
        B = bc_books.value
        mm, _, ds = B.shape
        ranks = np.arange(1, n_probe + 1, dtype=np.int32)
        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            # membership codes (rank-1 list is the inverted-file home)
            codes = np.empty((n, mm), dtype=np.int32)
            for s in range(mm):
                sub = M[:, s * ds : (s + 1) * ds]
                d2 = ((sub[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d2, axis=1)
            sims = M @ C.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            ids = pdf[id_col].to_numpy().astype("int64")
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, n_probe),
                    "list_id": top.reshape(-1).astype("int32"),
                    "probe_rank": np.tile(ranks, n),
                    "codes": [codes[i // n_probe] for i in range(n * n_probe)],
                    "__vec": pdf[vec_col].repeat(n_probe).reset_index(drop=True),
                }
            )

    routed = _fan_out(df.select(id_col, vec_col)).mapInPandas(
        route, member_schema
    )

    pair_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def list_shortlist(pdf: pd.DataFrame) -> pd.DataFrame:
        B = bc_books.value
        mm, _, ds = B.shape
        ids = pdf[id_col].to_numpy().astype(np.int64)
        members = (pdf["probe_rank"] == 1).to_numpy()
        if not members.any() or len(pdf) < 2:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cos_sim": []}
            )
        m_ids = ids[members]
        codes = np.vstack(pdf.loc[members, "codes"].to_numpy()).astype(np.int32)
        Q = np.vstack(pdf["__vec"].to_numpy()).astype(np.float64)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        lut = np.einsum(
            "qsd,scd->qsc", Q.reshape(len(Q), mm, ds), B, optimize=True
        )
        sims = np.zeros((len(Q), len(m_ids)))
        for s in range(mm):
            sims += lut[:, s, codes[:, s]]
        sims = np.round(sims, 6)
        # vectorized top-shortlist by PQ score (r8; the per-row Python
        # loop this replaces was real per-row work in the hot path).
        # Columns ordered by neighbor id so the stable sort breaks score
        # ties on id ascending, exactly as the row-at-a-time version did.
        order_by_id = np.argsort(m_ids, kind="stable")
        S = sims[:, order_by_id]
        ids_ord = m_ids[order_by_id]
        V_ord = np.vstack(pdf.loc[members, "__vec"].to_numpy()).astype(
            np.float64
        )[order_by_id]
        V_ord /= np.linalg.norm(V_ord, axis=1, keepdims=True)
        S = np.where(ids_ord[None, :] == ids[:, None], -np.inf, S)
        take = min(shortlist, S.shape[1])
        idx = np.argsort(-S, axis=1, kind="stable")[:, :take]
        vals = np.take_along_axis(S, idx, axis=1)
        keep = (vals > -np.inf).ravel()
        # ADC + REFINE, bucket-local (r8): the exact cosine for the PQ
        # shortlist is computed RIGHT HERE — the probed list already
        # holds both the query vector (it rode in with the probe) and
        # the member vectors, so resolving them again through two
        # corpus-wide rerank joins shuffled ~n_probe x shortlist x
        # vec-size bytes for nothing (measured 16 s of a 23 s call at
        # 20k x 64d).  Exact flops are only |queries| x shortlist x d
        # per bucket; downstream needs just a skinny per-query top-k
        # window.  Same candidate set, same 6-decimal rounding, same
        # tie-break as the join-based rerank it replaces.
        exact = np.round(
            np.einsum("qtd,qd->qt", V_ord[idx], Q, optimize=True), 6
        )
        return pd.DataFrame(
            {
                "query_id": np.repeat(ids, take)[keep],
                "neighbor_id": ids_ord[idx].ravel()[keep],
                "cos_sim": exact.ravel()[keep],
            }
        )

    pairs = routed.groupBy("list_id").applyInPandas(list_shortlist, pair_schema)
    # a neighbor belongs to exactly ONE home list, so a (query, neighbor)
    # pair arises in at most one probed list — no pair dedup needed; the
    # final k resolves with ONE window over the skinny scored pairs
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    scale: int = 10_000,
) -> DataFrame:
    """Fully-DISTRIBUTED Lloyd k-means over every vector (unlike
    :func:`train_quantizer`'s bounded-sample training): assignment is ONE
    JVM higher-order expression — a ``transform`` over the k×d centroid
    array literal computing the square-distance fold per centroid, then
    ``array_position(…, array_min(…))`` as the argmin (first index wins,
    so ties go to the lowest cluster id for free) — no Python in the
    per-row path and no per-centroid column rebuild per iteration.  The
    centroid update is one (cluster, dim) hash aggregate with map-side
    combine (k·d groups), and only the k×d centroid table ever reaches
    the driver.  The iterative-algorithm pattern of ``graph.py``:
    per-round work is one shuffle, driver state is O(k·d), rounds are
    bounded by ``iters``; the fixed-point frame is cached once so the
    ``iters``+1 passes never re-read or re-quantize the source.

    EXACT cross-engine arithmetic, so the result is oracle-checkable
    (DuckDB unrolls the same rounds as CTEs — the bpe_train discipline):
    components fixed-point at ``round(x·scale)`` BIGINT; distances are
    BIGINT dot products; centroids floor-divide toward zero
    (``(|s| div n)·sign(s)``) so both engines quantize identically; ties
    in the argmin go to the lowest cluster id.  Init is the vectors of
    the ``k`` smallest ids — deterministic, no RNG.

    Returns ``(id, cluster)`` for the assignment under the FINAL
    centroids (i.e. ``iters`` updates then one assignment pass).
    """
    _check_topk_params("kmeans_fit", k=None, n_clusters=k)
    # localCheckpoint, not persist (ADVICE r05 #4): same one-time
    # materialization for the iters+1 passes, but the storage is released
    # when the returned frame (which references it) is garbage-collected,
    # instead of pinning corpus-sized vectors until someone unpersists.
    # NULL vectors have no position in the space and are excluded
    # (nullvals edge axis — a NULL centroid init would otherwise crash);
    # zero vectors stay: k-means is Euclidean, not cosine
    base = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
                lambda x: F.round(x.cast("double") * scale).cast("bigint"),
        ).alias("__x"),
    ).localCheckpoint(eager=True)
    init = base.orderBy(id_col).limit(k).collect()
    if not init:
        raise ValueError(
            "kmeans_fit: input DataFrame is empty (no non-NULL vectors)"
        )
    cents = [list(r["__x"]) for r in init]
    dims = len(cents[0])

    def assign(frame: DataFrame) -> DataFrame:
        # one nested centroid-array literal per pass (k·d ints, model-
        # sized); distances via a transform over it, argmin via
        # array_position of the min — first match, i.e. lowest cluster id
        carr = F.array(
            *[F.array(*[F.lit(int(v)) for v in c]) for c in cents]
        )
        dists = F.transform(
            carr,
            lambda c: F.aggregate(
                F.zip_with(F.col("__x"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ),
        )
        return frame.select(
            id_col,
            "__x",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("long")
            .alias("cluster"),
        )

    for _ in range(iters):
        assigned = assign(base)
        sums = (
            assigned.select(
                "cluster", F.posexplode(F.col("__x")).alias("i", "v")
            )
            .groupBy("cluster", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = {c: list(old) for c, old in enumerate(cents)}  # empty keeps old
        acc: dict[int, list] = {}
        for r in sums:
            acc.setdefault(int(r["cluster"]), [None] * dims)[int(r["i"])] = (
                int(r["s"]),
                int(r["n"]),
            )
        for c, pairs in acc.items():
            new[c] = [
                (abs(s) // n) * (1 if s >= 0 else -1) for s, n in pairs
            ]
        cents = [new[c] for c in range(len(cents))]

    return assign(base).select(id_col, "cluster")


def kmeans_fit_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    scale: int = 10_000,
    dims: int = 64,
) -> str:
    """DuckDB mirror of :func:`kmeans_fit`: the same rounds unrolled as
    CTEs — same fixed point, same floor-toward-zero centroid division,
    same lowest-cluster tie rule, same keep-old-on-empty-cluster rule."""
    d2 = (
        f"list_sum(list_transform(range(1, {dims + 1}),"
        f" i -> (v.x[i] - c.c[i]) * (v.x[i] - c.c[i])))"
    )
    ctes = [
        f"""vecs AS (
          SELECT {id_col} AS vid,
                 list_transform({vec_col},
                                x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS x
          FROM {table}
        )""",
        f"""cent0 AS (
          SELECT (row_number() OVER (ORDER BY vid)) - 1 AS cluster, x AS c
          FROM (SELECT vid, x FROM vecs ORDER BY vid LIMIT {k})
        )""",
    ]
    for r in range(iters):
        ctes.append(
            f"""a{r} AS (
              SELECT vid, x, cluster FROM (
                SELECT v.vid, v.x, c.cluster,
                       row_number() OVER (PARTITION BY v.vid
                         ORDER BY {d2}, c.cluster) AS rn
                FROM vecs v CROSS JOIN cent{r} c
              ) WHERE rn = 1
            )"""
        )
        ctes.append(
            f"""s{r} AS (
              SELECT cluster, i,
                     CAST(sum(x[i]) AS BIGINT) AS s,
                     count(*)::BIGINT AS n
              FROM a{r}, (SELECT unnest(range(1, {dims + 1})) AS i)
              GROUP BY 1, 2
            )"""
        )
        ctes.append(
            f"""cent{r + 1} AS (
              SELECT p.cluster,
                     coalesce(
                       (SELECT list((abs(s.s) // s.n) *
                                    (CASE WHEN s.s >= 0 THEN 1 ELSE -1 END)
                                    ORDER BY s.i)
                        FROM s{r} s WHERE s.cluster = p.cluster),
                       p.c) AS c
              FROM cent{r} p
            )"""
        )
    return f"""WITH {', '.join(ctes)}
        SELECT vid AS {id_col}, cluster FROM (
          SELECT v.vid, c.cluster,
                 row_number() OVER (PARTITION BY v.vid
                   ORDER BY {d2}, c.cluster) AS rn
          FROM vecs v CROSS JOIN cent{iters} c
        ) WHERE rn = 1"""


# --- DuckDB mirror ---------------------------------------------------------


def cosine_topk_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    query_pred: str | None = None,
) -> str:
    """Exact top-k mirror.  cos_sim is rounded to 6 decimals BEFORE ranking
    (matching the Spark paths), so tie-breaks on neighbor_id resolve
    identically in both engines regardless of 1-ulp float noise.

    ``query_pred``: optional predicate on the QUERY side's columns (it is
    prefixed with the query alias, e.g. ``"vec_id % 4 = 0"`` →
    ``a.vec_id % 4 = 0``) — restricts which vectors act as queries while
    every vector stays a candidate, mirroring ``cosine_topk(queries=...)``.
    """
    qp = f" AND (a.{query_pred})" if query_pred else ""
    # zero-norm vectors are excluded on BOTH engines (cosine undefined;
    # see nonzero_vectors) — a no-op on unit-normalized fixtures
    return f"""
WITH v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS vec FROM {table}
           WHERE list_sum(list_transform({vec_col}::DOUBLE[], x -> x * x)) > 0),
sims AS (
  SELECT a.{id_col} AS query_id, b.{id_col} AS neighbor_id,
         round(
           list_sum(list_transform(range(1, len(a.vec) + 1),
                                   i -> a.vec[i] * b.vec[i]))
           / (sqrt(list_sum(list_transform(a.vec, x -> x * x)))
              * sqrt(list_sum(list_transform(b.vec, x -> x * x)))), 6) AS cos_sim
  FROM v a, v b WHERE a.{id_col} <> b.{id_col}{qp}
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {k}
"""


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 10_000,
) -> DataFrame:
    """Per-label embedding centroids (class prototypes — the base of
    nearest-centroid classification, prototype-based few-shot heads, and
    per-source drift monitoring).  Output: one row per (label, dim) with
    the EXACT integer component sum, member count, and the centroid
    component as one exactly-rounded division — the mergeable-partials
    idiom (sums and counts fold across shards; the division happens at
    read time).

    Plan: one posexplode (map-only) → one (label, dim) hash aggregate
    with map-side combine — |labels|·d groups regardless of row count.
    Components fixed-point at ``round(x·scale)`` BIGINT (double-cast
    first: FLOAT×INT multiplies in float on Spark but double elsewhere —
    the kmeans/perceptron lesson).
    """
    x = F.posexplode(
        F.transform(
            F.col(vec_col),
            lambda v: F.round(v.cast("double") * scale).cast("bigint"),
        )
    )
    return (
        df.select(F.col(label_col).alias("label"), x.alias("dim", "comp"))
        .groupBy("label", "dim")
        .agg(
            F.sum("comp").alias("comp_sum"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "label",
            F.col("dim").cast("long").alias("dim"),
            "comp_sum",
            "n",
            (F.col("comp_sum") / F.col("n")).alias("centroid_fp"),
        )
    )


def label_centroids_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 10_000,
    dims: int = 64,
) -> str:
    """DuckDB mirror of :func:`label_centroids` (0-based dims to match
    Spark posexplode; HUGEINT-dodging casts).  NULL vectors contribute no
    components on either engine (Spark's posexplode drops them; here the
    WHERE does — nullvals edge axis)."""
    return f"""
        WITH comps AS (
          SELECT {label_col} AS label, (i - 1)::BIGINT AS dim,
                 CAST(round(CAST({vec_col}[i] AS DOUBLE) * {scale}) AS BIGINT)
                   AS comp
          FROM {table}, (SELECT unnest(range(1, {dims + 1})) AS i)
          WHERE {vec_col} IS NOT NULL
        )
        SELECT label, dim,
               CAST(sum(comp) AS BIGINT) AS comp_sum,
               count(*)::BIGINT AS n,
               CAST(sum(comp) AS BIGINT) / count(*) AS centroid_fp
        FROM comps GROUP BY 1, 2"""
