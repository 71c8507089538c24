"""Similarity search over embedding columns (array<float>).

Two paths, both standard at scale:

- **brute-force top-k** (the exactness baseline): query×corpus dot
  products as JVM-side higher-order functions (``zip_with`` +
  ``aggregate`` — codegen, no Python), window ``row_number ≤ k``.
  Embeddings are quantized to int64 (×10⁴, round) so scoring is exact
  integer arithmetic — deterministic ranking, engine-portable oracle.
  At scale the query side is small and broadcast; corpus scan is
  embarrassingly parallel; the only shuffle is the per-query top-k,
  bounded to |Q|·k rows by a map-side partial top-k (Spark's window
  with AQE handles |Q| partitions; for huge |Q| use the LSH path).

- **sign-LSH bucketed** (the scale path): random-hyperplane sign bits
  (here: deterministic pseudo-hyperplanes from fixed integer seeds —
  no runtime RNG) bucket the corpus; queries probe their own bucket ±
  multiprobe flips. Approximate: recall measured against brute force
  in tests, not hash-matched against an oracle.

- **embedding near-dup pairs**: all corpus pairs above an integer dot
  threshold — exact (for the oracle) via a self-join pruned by LSH
  bucket when requested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def _spread_key(cid: str):
    """Engine-portable deterministic spread hash over an id column —
    the shared no-RNG sampler behind ivf_train init and both codebook
    samplers (factored r04: three copies had drifted into existence).
    Integer-castable ids use the `_mix` the SQL oracles replay;
    non-numeric ids fall back to xxhash64 (same spread property,
    Spark-only) instead of try_cast→NULL collapsing the sample to the
    lexicographic head."""
    from gdal_drivers_spark.operators.sample import _mix

    key_long = F.expr(f"try_cast({cid} AS BIGINT)")
    return F.when(key_long.isNotNull(), _mix(key_long)).otherwise(
        F.pmod(F.xxhash64(F.col(cid)), F.lit(1 << 32))
    )


def quantize(col, scale: int = 10_000):
    """array<float> → array<long> (round(v·scale)) — exact scoring.
    The float32→float64 promotion happens *before* the multiply so any
    engine computes round() on the identical double."""
    return F.transform(col, lambda v: F.round(v.cast("double") * scale).cast("long"))


def dot_int(a, b):
    """Integer dot product of two array<long> — JVM-side fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def brute_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    qid: str = "qid",
    cid: str = "cid",
    qvec: str = "qvec",
    cvec: str = "cvec",
) -> DataFrame:
    """Exact top-k by quantized dot product, ties by cid. Queries are
    broadcast (the small side); corpus never shuffles before scoring."""
    q = queries.select(F.col(qid).alias("_qid"), quantize(F.col(qvec)).alias("_qv"))
    c = corpus.select(F.col(cid).alias("_cid"), quantize(F.col(cvec)).alias("_cv"))
    scored = c.join(F.broadcast(q), F.col("_qid").isNotNull()).select(
        "_qid", "_cid", dot_int(F.col("_qv"), F.col("_cv")).alias("dot_q")
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("dot_q"), F.col("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias(qid), F.col("_cid").alias(cid), "dot_q", "rank")
    )


def _plane_sign(vec_q, plane: int, dim: int):
    """Deterministic pseudo-hyperplane: component j weight = ±1 by the
    high bit of a 16-bit multiplicative hash of (j, plane):
    ``((j+1)·69 + plane·131)·48271 mod 2¹⁶ < 2¹⁵`` — small exact
    integers, identical in any engine.

    Why not a parity scheme: the original family (±1 by parity of
    ``j·(2p+3)+p``) was DEGENERATE — 2p+3 is always odd, so
    ``j·(2p+3) ≡ j (mod 2)`` and every "plane" was ± one and the same
    hyperplane. Measured on the sf0.01 embeddings: 2 distinct buckets
    (each query scanned half the corpus), recall stuck at 0.58-0.60
    regardless of probing. The multiplicative family gives 62 distinct
    buckets on the same data and recall that actually responds to
    planes/tables (0.42 @ 1 table → 0.88 @ 4 tables).

    The hash runs in LONG arithmetic: in int32, ``(j+1)·69·48271``
    exceeds 2³¹ once dim ≳ 585 (e.g. 768/1024-dim embeddings), which
    silently wraps under non-ANSI Spark (buckets diverge from the
    documented formula) or throws ARITHMETIC_OVERFLOW under ANSI. The
    long path is bit-identical for small dims (no wrap ever occurred
    there) and exact to dim ~2.6e12."""
    s = F.aggregate(
        F.zip_with(
            vec_q,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda v, j: F.when(
                ((j + 1).cast("long") * 69 + F.lit(plane * 131))
                * F.lit(48271).cast("long") % 65536 < 32768,
                v,
            ).otherwise(-v),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return F.when(s > 0, 1).otherwise(0)


def lsh_bucket(vec: str, dim: int, n_planes: int = 8, table: int = 0):
    """Sign-LSH bucket id Column from n deterministic hyperplanes.
    ``table`` selects an independent plane set (global plane index
    ``table·n_planes + p``) for multi-table OR-amplification."""
    q = quantize(F.col(vec))
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * 2 + _plane_sign(q, table * n_planes + p, dim)
    return bucket.cast("long")


def _as_int64_vec(v):
    """Arrow/pandas array cell → exact int64 ndarray, or None for a
    malformed cell. Arrow hands an int64 array WITH nulls to pandas as
    float64 with NaN (or object with None) — and ``astype(int64)`` on
    NaN silently wraps to INT_MIN garbage instead of raising, so the
    vectorized kernels must screen NaN/None explicitly to reproduce
    the JVM folds' NULL semantics (r06)."""
    if v is None:
        return None
    a = np.asarray(v)
    if a.ndim != 1:
        return None
    if a.dtype == object:
        if any(x is None for x in a):
            return None
        try:
            return a.astype(np.int64)
        except (TypeError, ValueError):
            return None
    if np.issubdtype(a.dtype, np.floating):
        if np.isnan(a).any():
            return None
        return a.astype(np.int64)
    if np.issubdtype(a.dtype, np.integer):
        return a.astype(np.int64)
    return None


def _plane_sign_weights(plane: int, dim: int) -> list[int]:
    """The ±1 weight vector of one pseudo-hyperplane — the
    ``_plane_sign`` hash evaluated at plan-build time (Python ints are
    arbitrary-precision, so this is exactly the long-arithmetic result
    of the runtime formula). Used by the vectorized bucket kernel."""
    return [
        1 if ((j + 1) * 69 + plane * 131) * 48271 % 65536 < 32768 else -1
        for j in range(dim)
    ]


def _lsh_buckets_udf(dim: int, n_planes: int, n_tables: int):
    """Vectorized all-tables bucket kernel (r06, guide §4.2): ONE Arrow
    hop computes every table's bucket for a batch of already-QUANTIZED
    vectors as an exact int64 matmul against the literal ±1 sign matrix
    — replacing n_tables × n_planes interpreted higher-order folds per
    row (the folds were ~0.4 ms/row/table at dim 64; the matmul is
    ~0.1 µs). Values are bit-identical to ``lsh_bucket``: same signs
    (``_plane_sign_weights`` IS the ``_plane_sign`` hash), same
    ``s > 0`` bit rule, same bit packing.

    Poison semantics mirror the fold exactly: a NULL vector, a vector
    SHORTER than ``dim`` or one containing NULL elements yields a NULL
    plane sum in the fold, and ``when(s > 0).otherwise(0)`` sends every
    bit to 0 — so those rows get bucket 0 in every table. A vector
    LONGER than ``dim`` contributes its tail NEGATED (``zip_with`` pads
    the shorter sequence side with null j, and the ``when``'s otherwise
    branch is ``-v``) — reproduced by the tail subtraction below."""
    W = np.array(
        [_plane_sign_weights(p, dim) for p in range(n_tables * n_planes)],
        dtype=np.int64,
    )
    pow_bits = (1 << (n_planes - 1 - np.arange(n_planes))).astype(np.int64)

    def _row(a):
        if a is None or len(a) < dim:
            return [0] * n_tables  # NULL fold → all-0 bits
        s = W @ a[:dim]
        if len(a) > dim:
            s = s - int(a[dim:].sum())
        bits = (s > 0).astype(np.int64).reshape(n_tables, n_planes)
        return [int(b) for b in bits @ pow_bits]

    @F.pandas_udf("array<long>")
    def _buckets(qs: pd.Series) -> pd.Series:
        arrs = [_as_int64_vec(v) for v in qs]
        if all(a is not None and len(a) == dim for a in arrs):
            Q = np.stack(arrs) if arrs else np.empty((0, dim), np.int64)
            S = Q @ W.T
            bits = (S > 0).astype(np.int64)
            B = bits.reshape(len(Q), n_tables, n_planes) @ pow_bits
            return pd.Series(list(B))
        return pd.Series([_row(a) for a in arrs])

    return _buckets


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    qid: str = "qid",
    cid: str = "cid",
    qvec: str = "qvec",
    cvec: str = "cvec",
    probe_bits: int = 0,
    n_tables: int = 4,
    broadcast_queries: bool = True,
    exclude_self: bool = False,
    self_join: bool = False,
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates. Recall is
    a test property (vs brute_topk), not a parity contract.

    ``self_join=True`` declares that ``queries`` IS ``corpus`` (the
    kNN-graph case): the quantized+bucketed base is then built ONCE and
    materialized (``localCheckpoint`` — the LSH index you would persist
    anyway at 10⁹ vectors), and both join sides and both score-time
    vector frames derive from it. Without it the planner computes the
    bucket kernel once per side and re-quantizes per attach frame —
    four scans of the same input (r06).

    ``broadcast_queries`` (r04, VERDICT #3): the default broadcasts the
    (small) query side — right for query serving, fatal when
    queries == corpus (kNN-graph construction: the broadcast is the
    whole ×n_tables×(1+probes) exploded corpus). ``False`` drops the
    hint so Catalyst/AQE plans a shuffle join on the (table, bucket)
    equi-key — both sides partition by the same key, no replication.
    ``exclude_self`` removes qid == cid pairs before ranking (a graph
    wants neighbors, not the trivial self-edge).

    Two standard recall levers, composable:
    - ``n_tables`` (OR-amplification, the default lever): L
      independent plane sets; the candidate set is the union of
      same-bucket matches over tables. Cost: the corpus index is L×
      (each vector appears in L (table, bucket) rows), recall
      1-(1-p^b)^L. Measured on the sf0.01 embeddings fixture:
      recall@5 = 0.42 / 0.62 / 0.88 / 0.90 at L = 1/2/4/8.
    - ``probe_bits=1``: radius-1 multiprobe within each table (also
      probe the n_planes buckets one sign-flip away) — cheaper than
      more tables (no corpus blow-up), weaker per unit of extra
      candidates."""
    n_tables = max(1, n_tables)
    buckets_udf = _lsh_buckets_udf(dim, n_planes, n_tables)

    def side(df, id_col, vec_col, alias_id, alias_vec):
        # r06 (guide §4.2, §2.3): ONE scan + one Arrow hop computing
        # every table's bucket (exact int64 matmul, bit-identical to
        # lsh_bucket — see _lsh_buckets_udf) + a JVM posexplode,
        # replacing the L-way union that re-scanned the input and
        # re-ran L×n_planes interpreted folds per row. _t is the array
        # position — exactly the old union's lit(t).
        base = df.select(
            F.col(id_col).alias(alias_id),
            quantize(F.col(vec_col)).alias(alias_vec),
        ).select(
            alias_id, alias_vec,
            buckets_udf(F.col(alias_vec)).alias("_bs"),
        )
        return base.select(
            alias_id, alias_vec, F.posexplode("_bs").alias("_t", "_b")
        )

    qv_frame = cv_frame = None
    if self_join:
        base = corpus.select(
            F.col(cid).alias("_cid"), quantize(F.col(cvec)).alias("_cv")
        ).select(
            "_cid", "_cv", buckets_udf(F.col("_cv")).alias("_bs")
        ).localCheckpoint(eager=True)
        c = base.select("_cid", "_cv", F.posexplode("_bs").alias("_t", "_b"))
        q = c.select(
            F.col("_cid").alias("_qid"), F.col("_cv").alias("_qv"), "_t", "_b"
        )
        qv_frame = base.select(
            F.col("_cid").alias("_qid"), F.col("_cv").alias("_qv")
        )
        cv_frame = base.select("_cid", "_cv")
    else:
        q = side(queries, qid, qvec, "_qid", "_qv")
    if probe_bits >= 1:
        q = q.select(
            "_qid",
            "_qv",
            "_t",
            F.explode(
                F.array(
                    F.col("_b"),
                    *[
                        F.col("_b").bitwiseXOR(F.lit(1 << i)).cast("long")
                        for i in range(n_planes)
                    ],
                )
            ).alias("_b"),
        )
    if not self_join:
        c = side(corpus, cid, cvec, "_cid", "_cv")
    if broadcast_queries:
        # serving shape: queries broadcast, the corpus is scored in its
        # own map stage and never shuffles before the per-pair rollup
        scored = c.join(F.broadcast(q), ["_t", "_b"]).select(
            "_qid", "_cid", dot_int(F.col("_qv"), F.col("_cv")).alias("dot_q")
        )
        if exclude_self:
            scored = scored.filter(F.col("_qid") != F.col("_cid"))
        # a pair found in several tables scores identically each time —
        # collapse before ranking so row_number sees one row per candidate
        scored = scored.groupBy("_qid", "_cid").agg(F.max("dot_q").alias("dot_q"))
    else:
        # self-join / bulk shape (r06, guide §8 "decide with small
        # rows, move payloads once"): the (table, bucket) equi-join
        # carries ONLY ids — a hot bucket's |q_b|·|c_b| pair blow-up is
        # 16-byte rows, not vector payloads — then pairs are DEDUPED
        # across tables (distinct on skinny keys, map-side partial agg)
        # BEFORE any dim-length arithmetic, and vectors are attached
        # once per distinct pair. At r05 the old shape scored every
        # occurrence first: 3.1 M interpreted dots on the bench corpus
        # for 1.96 M distinct pairs, with both vector payloads riding
        # the bucket join. No broadcast hint anywhere — Catalyst/AQE
        # plan shuffle joins on the equi-keys (the knn_graph
        # no-broadcast contract).
        cand = (
            c.select("_cid", "_t", "_b")
            .join(q.select("_qid", "_t", "_b"), ["_t", "_b"])
            .select("_qid", "_cid")
        )
        if exclude_self:
            cand = cand.filter(F.col("_qid") != F.col("_cid"))
        cand = cand.distinct()
        if qv_frame is None:
            qv_frame = queries.select(
                F.col(qid).alias("_qid"), quantize(F.col(qvec)).alias("_qv")
            )
            cv_frame = corpus.select(
                F.col(cid).alias("_cid"), quantize(F.col(cvec)).alias("_cv")
            )
        scored = (
            cand.join(qv_frame, "_qid")
            .join(cv_frame, "_cid")
            .select(
                "_qid", "_cid", dot_int(F.col("_qv"), F.col("_cv")).alias("dot_q")
            )
        )
    w = Window.partitionBy("_qid").orderBy(F.desc("dot_q"), F.col("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias(qid), F.col("_cid").alias(cid), "dot_q", "rank")
    )


def knn_graph(
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    probe_bits: int = 0,
    cid: str = "cid",
    cvec: str = "cvec",
) -> DataFrame:
    """Corpus self-kNN via LSH — the kNN-GRAPH construction shape
    (dedup graphs, clustering seeds): queries = corpus, so NEITHER
    side may broadcast (at 10⁹ vectors the broadcast side would be the
    whole ×n_tables exploded corpus). Compiles to a shuffle join on
    the (table, bucket) equi-key — both sides hash-partition the same
    way, cost Σ per-bucket |q_b|·|c_b| like every other bucketed pair
    generator in the engine. Self-edges excluded. Output:
    (qid, cid, dot_q, rank ≤ k) — qid ranges over the corpus ids.
    Deterministic plane family → bit-exact SQL oracle (``knn_graph``);
    recall vs brute force is the pytest property (VERDICT r03 #5)."""
    q = corpus.select(F.col(cid).alias("_gq"), F.col(cvec).alias("_gv"))
    return lsh_topk(
        q, corpus, dim, k=k, n_planes=n_planes, n_tables=n_tables,
        probe_bits=probe_bits, qid="_gq", qvec="_gv", cid=cid, cvec=cvec,
        broadcast_queries=False, exclude_self=True, self_join=True,
    ).withColumnRenamed("_gq", "qid")


def ivf_train(
    corpus: DataFrame,
    n_lists: int,
    iters: int = 2,
    cid: str = "cid",
    cvec: str = "cvec",
) -> DataFrame:
    """Deterministic distributed k-means (Lloyd) for IVF coarse
    centroids. Init: the ``n_lists`` corpus vectors with the smallest
    multiplicative key hash (a deterministic spread sample — no RNG).
    Each round: assign every vector to its nearest centroid by
    quantized dot (the ``ivf_assign`` argmax shape — broadcast
    centroids, map-side ``max_by``, one shuffled row per vector), then
    recompute each centroid as the per-component mean of its members.

    DETERMINISM (what makes this oracle-able, unlike RNG-seeded
    k-means): the mean is computed as exact integer arithmetic —
    per-component SUM of quantized int64 components (order-free) and
    the member count — and only then one double division
    ``sum/(n·10⁴)``, identical in any engine. Empty lists keep their
    previous centroid. Returns (list_id, center:array<double>).

    Cost per round at scale: one broadcast-join pass over the corpus +
    one groupBy(list) of dim-component partial sums — both map-side
    combined; nothing quadratic, nothing driver-side except the
    n_lists×dim centroid table itself."""
    spread = _spread_key(cid)
    init = (
        corpus.select(
            F.col(cid).alias("_cid"),
            F.col(cvec).alias("_vec"),
            spread.alias("_h"),
        )
        .orderBy("_h", "_cid")
        .limit(n_lists)
    )
    w0 = Window.orderBy("_h", "_cid")
    cents = init.select(
        (F.row_number().over(w0) - 1).alias("list_id"),
        F.transform(F.col("_vec"), lambda v: v.cast("double")).alias("center"),
    )
    for _ in range(max(0, iters)):
        assigned = ivf_assign(corpus, cents, cid=cid, cvec=cvec)
        sums = (
            assigned.select(
                "list_id", F.posexplode(F.col("_cv")).alias("pos", "val")
            )
            .groupBy("list_id", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("s"), F.col("n")))
                    ),
                    lambda x: x["s"].cast("double")
                    / (x["n"].cast("double") * 10000.0),
                ).alias("_new")
            )
        )
        cents = cents.join(sums, "list_id", "left").select(
            "list_id", F.coalesce(F.col("_new"), F.col("center")).alias("center")
        )
        # truncate lineage: each round's plan would otherwise nest the
        # previous round's join; centroids are tiny (n_lists × dim)
        cents = cents.localCheckpoint(eager=True)
    return cents


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    cid: str = "cid",
    cvec: str = "cvec",
    list_col: str = "list_id",
) -> DataFrame:
    """IVF coarse quantization: assign every corpus vector to its
    nearest centroid list by max quantized dot (ties → smaller centroid
    id). ``centroids`` columns: (list_id, center:array<float>).

    r06 plan shape (guide §2.4 / §4.2): a ZERO-SHUFFLE narrow map. The
    quantized centroid table (n_lists × dim ints — exactly the payload
    the old plan broadcast) is collected once at plan-build time and
    shipped in the task closure; one Arrow hop computes every vector's
    argmax as an exact int64 matmul. The previous shape exploded
    |corpus| × |centroids| scored rows through an interpreted fold and
    re-collapsed them with a ``max_by`` groupBy — a whole aggregation
    exchange that existed only to undo the explode.

    Semantics are pinned by test_ivf_assign_edge_semantics and
    bit-equal to the old plan: exact integer dots, ties → smaller
    list_id; a malformed vector (NULL, wrong length, NULL element —
    every dot NULL) gets the SMALLEST list_id (the old all-NULL
    ``max_by`` tie-break); a malformed centroid never wins; empty
    centroids → empty output (the old inner join)."""
    c = corpus.select(F.col(cid).alias("_cid"), quantize(F.col(cvec)).alias("_cv"))
    cent_rows = centroids.select(
        F.col(list_col).alias("_lid"), quantize(F.col("center")).alias("_ctv")
    ).collect()  # bounded: n_lists × dim — the old broadcast payload
    list_type = dict(centroids.dtypes).get(list_col, "bigint")
    if not cent_rows:
        return c.select(
            F.col("_cid").alias(cid),
            F.lit(None).cast(list_type).alias(list_col),
            "_cv",
        ).filter(F.lit(False))

    # centroids grouped by length; only a centroid of the vector's own
    # length (and with no NULL components) yields a non-NULL dot
    min_lid = min(int(r["_lid"]) for r in cent_rows)
    groups: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    by_len: dict[int, list] = {}
    for r in sorted(cent_rows, key=lambda r: int(r["_lid"])):
        v = r["_ctv"]
        if v is None or any(x is None for x in v):
            continue
        by_len.setdefault(len(v), []).append((int(r["_lid"]), v))
    for ln, rows in by_len.items():
        groups[ln] = (
            np.array([lid for lid, _ in rows], dtype=np.int64),
            np.array([list(v) for _, v in rows], dtype=np.int64),
        )
    uniq = list(groups.items())
    fast_dim, (fast_lids, fast_m) = (
        uniq[0] if len(uniq) == 1 else (None, (None, None))
    )

    def _row(a):
        if a is None:
            return min_lid  # every dot NULL → all-NULL tie-break
        grp = groups.get(len(a))
        if grp is None:
            return min_lid
        lids, M = grp
        d = M @ a
        return int(lids[int(np.argmax(d))])  # lids ascending → first max

    @F.pandas_udf(list_type)
    def _assign(vs: pd.Series) -> pd.Series:
        arrs = [_as_int64_vec(v) for v in vs]
        if fast_dim is not None and all(
            a is not None and len(a) == fast_dim for a in arrs
        ):
            X = np.stack(arrs) if arrs else np.empty((0, fast_dim), np.int64)
            D = X @ fast_m.T
            return pd.Series(fast_lids[np.argmax(D, axis=1)])
        return pd.Series([_row(a) for a in arrs], dtype=np.int64)

    return c.select(
        F.col("_cid").alias(cid), _assign(F.col("_cv")).alias(list_col), "_cv"
    )


_UNSET = object()  # "no cached residual flag" sentinel (None is a valid flag)


def _residual_flag(encoded: DataFrame) -> bool | None:
    """Homogeneous ``_residual`` flag of an encoded index, validated
    with ONE aggregate (min == max), not a sampled ``.first()`` — a
    heterogeneous index (a union or append mixing residual=True/False
    partitions) is REFUSED instead of silently mis-ranking (ADVICE
    r04). Returns None when the column is absent or the frame empty."""
    if "_residual" not in encoded.columns:
        return None
    row = encoded.agg(
        F.min("_residual").alias("lo"), F.max("_residual").alias("hi")
    ).first()
    if row["lo"] is None:
        return None
    if bool(row["lo"]) != bool(row["hi"]):
        raise ValueError(
            "encoded index mixes residual=True and residual=False rows "
            "(union/append of incompatible indexes) — rebuild or re-encode "
            "one side before serving"
        )
    return bool(row["lo"])


def write_ivf_index(
    lists: DataFrame, table: str, path: str, buckets: int = 16
) -> None:
    """Persist a built IVF index (the ``ivf_assign`` output — or the
    ``ivfpq_encode`` output for PQ codes) as a parquet table BUCKETED
    by ``list_id``: the index-build half of the serving path. Query
    batches then run against ``read_ivf_index`` and never re-scan or
    re-quantize the corpus (VERDICT r03 #1 — at 10¹² vectors the
    repeated assignment pass was the dominant avoidable serving cost);
    bucketing clusters each inverted list's rows so a probe touches a
    bounded file set. Delegates to the engine's layout contract
    (``plans/layout.write_bucketed``).

    ``_residual`` homogeneity is validated ONCE here (aggregate, not a
    sampled row) and recorded as the ``gds.residual`` table property,
    so readers and appends can check compatibility from metadata. The
    validation runs AFTER the write, over the just-written table — one
    scan of a single RLE boolean column — not over the input frame:
    pre-write validation would execute the whole upstream encode DAG
    twice (once for the aggregate, once for the write), doubling the
    dominant cost of an index build. A mixed-flag input is still
    refused — the half-written table is dropped before the raise."""
    import shutil

    from gdal_drivers_spark.plans.layout import write_bucketed

    spark = lists.sparkSession
    write_bucketed(lists, table, path, buckets, key="list_id")
    try:
        flag = _residual_flag(spark.table(table))
    except ValueError:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(path, ignore_errors=True)
        raise
    if flag is not None:
        spark.sql(
            f"ALTER TABLE {table} SET TBLPROPERTIES ('gds.residual'='{str(flag).lower()}')"
        )


def append_to_ivf_index(delta: DataFrame, table: str) -> None:
    """Incremental index append (VERDICT r04 #5): a 100 TB corpus
    ingests continuously — assign/encode ONLY the new vectors
    (``ivf_assign``/``ivfpq_encode`` over the delta) and append the
    result to the persisted bucketed layout; serving then reads the
    union via ``read_ivf_index`` with no rebuild. The write touches
    delta-sized data only (the base index is never re-scanned —
    plan-asserted in tests); Spark validates the bucket spec against
    the existing table, so appended files land in the same
    ``list_id`` buckets the probes prune by.

    Residual compatibility is enforced from metadata: a delta whose
    ``_residual`` flag (aggregate-validated) differs from the table's
    ``gds.residual`` property is refused — the mixed index would
    mis-rank silently (ADVICE r04)."""
    spark = delta.sparkSession
    info = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }
    buckets = int(info.get("Num Buckets", "16"))
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }
    base_flag = props.get("gds.residual")
    delta_flag = _residual_flag(delta)
    if base_flag is None and delta_flag is not None:
        # pre-property table (or the ALTER was lost mid-session):
        # silently skipping the check here would let an incompatible
        # delta append cleanly and mis-rank at serve time — derive the
        # flag from the table's own column (one scan of an RLE boolean)
        # and BACKFILL the property so the next append reads metadata
        derived = _residual_flag(spark.table(table))
        if derived is not None:
            base_flag = str(derived).lower()
            spark.sql(
                f"ALTER TABLE {table} SET TBLPROPERTIES "
                f"('gds.residual'='{base_flag}')"
            )
    if base_flag is not None and delta_flag is not None:
        if (base_flag == "true") != delta_flag:
            raise ValueError(
                f"delta encoded with residual={delta_flag} but index table "
                f"{table} holds residual={base_flag} codes — re-encode the "
                "delta with the table's decomposition"
            )
    (
        delta.write.mode("append")
        .bucketBy(buckets, "list_id")
        .sortBy("list_id")
        .format("parquet")
        .saveAsTable(table)
    )


def index_stats(lists: DataFrame, cid: str = "cid") -> DataFrame:
    """List-balance census of an IVF index (r05): vectors per inverted
    list plus each list's share of the corpus in ppm — the skew
    diagnosis a 10¹²-vector index serves or dies by (a hot list makes
    every probe that touches it scan its whole run; the census says
    WHICH lists need splitting or finer centroids, the same role the
    cell census plays for the tile engine's salting). One map-side
    partial-aggregated groupBy over the index frame — never the
    corpus — plus a broadcast of the ≤|lists| totals row; exact
    INTEGER division end-to-end (ppm = n·10⁶ div total — no FP, so the
    SQL oracle is bit-exact by construction). Output:
    (list_id, n_vectors, ppm), one row per non-empty list."""
    counts = lists.groupBy("list_id").agg(F.count(cid).alias("n_vectors"))
    total = counts.agg(F.sum("n_vectors").alias("_tot"))
    return (
        counts.join(F.broadcast(total), F.lit(True))
        .select(
            "list_id",
            "n_vectors",
            F.expr("n_vectors * 1000000L div _tot").alias("ppm"),
        )
    )


def read_ivf_index(spark, table: str | None = None, path: str | None = None) -> DataFrame:
    """Read back a persisted IVF index for the ``lists=``/``encoded=``
    query-time arguments of ``ivf_topk``/``ivfpq_topk``.

    ``table`` resolves through the session catalog (bucketing metadata
    preserved — probes prune by ``list_id`` bucket). ``path`` reads
    the parquet directly, bypassing the shared catalog/warehouse — the
    catalog-free alternative for concurrent sessions that must not
    race on a table name (VERDICT r04 "wrong" #4); the trade-off is
    that a path read carries no bucket metadata, so joins against it
    shuffle instead of pruning buckets.

    The index's residual flag is resolved HERE, once per read — from
    the ``gds.residual`` table property (one catalog RPC, no job) when
    reading a table, else one aggregate over the boolean column — and
    cached on the returned frame, so ``ivfpq_topk``'s default
    ``check_residual=True`` costs a hot serving loop nothing (the
    pre-r05 behavior re-scanned the whole index every call)."""
    if (table is None) == (path is None):
        raise ValueError("read_ivf_index takes exactly one of table= or path=")
    df = spark.table(table) if table is not None else spark.read.parquet(path)
    flag = None
    if table is not None:
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        }
        if "gds.residual" in props:
            flag = props["gds.residual"] == "true"
    if flag is None:
        flag = _residual_flag(df)
    df._gds_residual_flag = flag
    return df


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame | None,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    qid: str = "qid",
    cid: str = "cid",
    qvec: str = "qvec",
    cvec: str = "cvec",
    lists: DataFrame | None = None,
    broadcast_probes: bool = True,
) -> DataFrame:
    """IVF-Flat approximate top-k: corpus is bucketed into inverted
    lists (``ivf_assign``); each query probes its ``nprobe`` nearest
    lists and scores only those lists' vectors. The scale path when the
    corpus is too large to brute-force: the query join touches
    |corpus|·(nprobe/n_lists) rows. Deterministic — centroids are
    data-derived, scoring is exact integer — so the whole thing has a
    closed-form SQL oracle, unlike RNG-seeded IVF.

    INDEX LIFECYCLE (VERDICT r03 #1): pass ``lists=`` (an
    ``ivf_assign`` result, typically persisted via ``write_ivf_index``
    and read back) to serve repeated query batches without re-scanning
    the corpus — ``corpus`` may then be None. The convenience default
    (lists=None) assigns in-line.

    ``broadcast_probes`` (VERDICT r04 #2, the lsh_topk
    ``broadcast_queries`` fix applied here): the default broadcasts
    the probe frame — right for serving batches, where it is
    |Q|·nprobe rows carrying one quantized query vector each. A BULK
    re-scoring run with |Q| ~ 10⁸ explodes that broadcast exactly the
    way lsh_topk's query side did pre-r04; pass ``False`` to drop the
    hint so Catalyst/AQE plans a shuffle join on the ``list_id``
    equi-key (both sides hash-partition the same way)."""
    if lists is None:
        if corpus is None:
            raise ValueError("ivf_topk needs either corpus or a prebuilt lists index")
        lists = ivf_assign(corpus, centroids, cid=cid, cvec=cvec)
    else:
        missing = {cid, "list_id", "_cv"} - set(lists.columns)
        if missing:
            raise ValueError(f"prebuilt lists index lacks columns {sorted(missing)}")
    cents = centroids.select(
        F.col("list_id").alias("_lid"), quantize(F.col("center")).alias("_ctv")
    )
    q = queries.select(F.col(qid).alias("_qid"), quantize(F.col(qvec)).alias("_qv"))
    qscored = q.join(F.broadcast(cents), F.lit(True)).select(
        "_qid", "_qv", "_lid", dot_int(F.col("_qv"), F.col("_ctv")).alias("_d")
    )
    wq = Window.partitionBy("_qid").orderBy(F.desc("_d"), F.col("_lid"))
    probes = (
        qscored.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select("_qid", "_qv", F.col("_lid").alias("list_id"))
    )
    probe_side = F.broadcast(probes) if broadcast_probes else probes
    scored = lists.join(probe_side, "list_id").select(
        "_qid", F.col(cid).alias("_cid"), dot_int(F.col("_qv"), F.col("_cv")).alias("dot_q")
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("dot_q"), F.col("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias(qid), F.col("_cid").alias(cid), "dot_q", "rank")
    )


def near_dup_pairs(
    corpus: DataFrame,
    threshold: int,
    cid: str = "cid",
    cvec: str = "cvec",
    exact: bool = False,
    dim: int = 64,
) -> DataFrame:
    """Corpus pairs (id1 < id2) with integer dot ≥ threshold.

    DEFAULT is the LSH-bucketed plan (same-sign-sketch pairs only):
    a bucket equi-join whose cost is Σ per-bucket n², not corpus n² —
    the only shape that survives 10⁹ vectors. ``exact=True`` opts into
    the all-pairs self-join (the oracle baseline; n² — small corpora
    only, guarded). Recall of the default vs the exact path is asserted
    in tests/test_pipeline_ops.py."""
    if exact:
        c = corpus.select(F.col(cid).alias("_id"), quantize(F.col(cvec)).alias("_v"))
        a = c.select(F.col("_id").alias("id1"), F.col("_v").alias("v1"))
        b = c.select(F.col("_id").alias("id2"), F.col("_v").alias("v2"))
        j = a.join(b, on=F.lit(True)).filter(F.col("id1") < F.col("id2"))
    else:
        c = corpus.select(
            F.col(cid).alias("_id"), quantize(F.col(cvec)).alias("_v"),
            lsh_bucket(cvec, dim).alias("_b"),
        )
        a = c.select(F.col("_id").alias("id1"), F.col("_v").alias("v1"), "_b")
        b = c.select(F.col("_id").alias("id2"), F.col("_v").alias("v2"), "_b")
        j = a.join(b, on="_b").filter(F.col("id1") < F.col("id2"))
    return (
        j.select("id1", "id2", dot_int(F.col("v1"), F.col("v2")).alias("dot_q"))
        .filter(F.col("dot_q") >= threshold)
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    qid: str = "qid",
    cid: str = "cid",
    qvec: str = "qvec",
    cvec: str = "cvec",
) -> DataFrame:
    """Exact cosine top-k: dot and both squared norms are exact
    integers over the quantized vectors, so cos = dot/sqrt(n1·n2) is
    one correctly-rounded IEEE expression — identical doubles in any
    engine, hence an exact oracle (reported as round(cos·10⁶)).
    Same plan shape as brute_topk: broadcast queries, narrow scoring,
    WindowGroupLimit top-k."""
    q = queries.select(F.col(qid).alias("_qid"), quantize(F.col(qvec)).alias("_qv"))
    c = corpus.select(F.col(cid).alias("_cid"), quantize(F.col(cvec)).alias("_cv"))
    scored = c.join(F.broadcast(q), F.col("_qid").isNotNull()).select(
        "_qid",
        "_cid",
        dot_int(F.col("_qv"), F.col("_cv")).alias("_dot"),
        dot_int(F.col("_qv"), F.col("_qv")).alias("_n1"),
        dot_int(F.col("_cv"), F.col("_cv")).alias("_n2"),
    )
    # cast each norm to double BEFORE multiplying: n1*n2 as int64 can
    # silently overflow for unnormalized vectors (e.g. raw histogram
    # counts at quantize scale 10⁴); double×double cannot, and for
    # in-range values double(n1)·double(n2) == double(n1·n2) exactly
    # (≤2⁵³), so the oracle contract is unchanged where it applied
    cos = F.col("_dot") / F.sqrt(F.col("_n1").cast("double") * F.col("_n2").cast("double"))
    scored = scored.withColumn("cos_q6", F.round(cos * 1e6).cast("long"))
    w = Window.partitionBy("_qid").orderBy(F.desc("cos_q6"), F.col("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias(qid), F.col("_cid").alias(cid), "cos_q6", "rank")
    )


# ------------------------------------------------------------------ PQ
# Product quantization — the memory-compression path at 10^12-vector
# scale: a corpus vector becomes m small code ids (one per subspace)
# instead of dim floats, and query scoring is m table lookups (ADC)
# instead of a dim-length dot. Composes with IVF (probe lists, then
# ADC-score the probed lists' codes) exactly as in the standard
# IVF-PQ design (Jégou et al. 2011, "Product Quantization for Nearest
# Neighbor Search" — public). Everything here is deterministic exact
# integer arithmetic over the quantized vectors, so the whole
# encode→score chain has a closed-form SQL oracle.


def pq_codewords_from_sample(
    corpus: DataFrame, ncodes: int, cid: str = "cid", cvec: str = "cvec"
) -> list[list[int]]:
    """Deterministic codebook: the ``ncodes`` corpus vectors with the
    smallest engine-portable spread hash (same no-RNG init as
    ivf_train), quantized. Returns a Python list (ncodes × dim ints) —
    the codebook is the ONLY driver-side object, bounded at
    ncodes·dim ints just like IVF's centroid table."""
    spread = _spread_key(cid)
    rows = (
        corpus.select(quantize(F.col(cvec)).alias("_q"), spread.alias("_h"),
                      F.col(cid).alias("_cid"))
        .orderBy("_h", "_cid")
        .limit(ncodes)
        .collect()
    )
    return [[int(v) for v in r["_q"]] for r in rows]


def _pq_codebook_col(codewords: list[list[int]]):
    """ncodes × dim literal nested array Column (tiny — broadcast with
    the task binary, like solid's constant tile). ONE nested Literal
    node, not ncodes·dim F.lit nodes (r04: the element-wise form cost
    Catalyst seconds of ANALYSIS per query on a 16×64 codebook — a
    fixed driver cost, but a silly one); cast pins bigint so the
    exact-integer arithmetic contract is inference-independent."""
    return F.lit([[int(v) for v in cw] for cw in codewords]).cast(
        "array<array<bigint>>"
    )


def _pq_codes_udf(codewords: list[list[int]], m: int):
    """Vectorized PQ sub-code kernel (r06, guide §4.2): array<int> of m
    sub-codes from an already-QUANTIZED (or residual) array<long>
    Column. Per subspace j the code is the codeword with the minimum
    EXACT integer squared L2 distance on components [j·d, (j+1)·d),
    ties → smaller code id — the same rule the old per-row
    ``array_min``-over-struct expression evaluated, but as one int64
    numpy pass per Arrow batch instead of m·ncodes interpreted
    slice/fold allocations per row (~2 ms/row at m=8, ncodes=16 — the
    dominant cost of ann_ivfpq's encode at r05). ``np.argmin`` returns
    the FIRST minimum, which is exactly the ties→smaller-code rule.

    Poison semantics match the old expression: a subspace whose slice
    is incomplete (vector NULL, shorter than (j+1)·d, or with a NULL
    component in the slice) had NULL dists for every codeword, and the
    lexicographic ``array_min`` over struct<dist, code> then picked
    code 0 (NULL dist sorts first, ties → smallest code) — here those
    subspaces emit code 0 directly."""
    dim = len(codewords[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    cb = np.array([[int(v) for v in cw] for cw in codewords], dtype=np.int64)

    def _row(v):
        # per-subspace: an incomplete/NULL-bearing slice had NULL dists
        # for every codeword → the old array_min picked code 0
        if v is None:
            return [0] * m
        vals = list(v)
        codes = []
        for j in range(m):
            sl = vals[j * d:(j + 1) * d]
            a = None
            if len(sl) == d:
                a = _as_int64_vec(sl)
            if a is None:
                codes.append(0)
                continue
            dist = ((a[None, :] - cb[:, j * d:(j + 1) * d]) ** 2).sum(axis=1)
            codes.append(int(np.argmin(dist)))
        return codes

    @F.pandas_udf("array<int>")
    def _codes(vs: pd.Series) -> pd.Series:
        arrs = [_as_int64_vec(v) for v in vs]
        if all(a is not None and len(a) >= dim for a in arrs):
            X = np.stack([a[:dim] for a in arrs]) if arrs else np.empty(
                (0, dim), np.int64)
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                sl = slice(j * d, (j + 1) * d)
                D = ((X[:, None, sl] - cb[None, :, sl]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(D, axis=1)
            return pd.Series(list(codes))
        return pd.Series([_row(v) for v in vs])

    return _codes


def _pq_tables_expr(qv, codewords: list[list[int]], m: int):
    """array<array<long>> ADC lookup tables (m × ncodes exact integer
    dots) from an already-QUANTIZED query vector Column."""
    dim = len(codewords[0])
    if dim % m:
        # same guard as the encode path — a non-dividing m would
        # silently drop the trailing dim % m components from every
        # ADC score (review r03)
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    cb = _pq_codebook_col(codewords)
    ncodes = len(codewords)
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.sequence(F.lit(0), F.lit(ncodes - 1)),
            lambda c: F.aggregate(
                F.zip_with(
                    F.slice(qv, j * d + 1, d),
                    F.slice(F.element_at(cb, c + 1), j * d + 1, d),
                    lambda a, b: a * b,
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        ),
    )


def _pq_adc_score(codes_col, tables_col):
    """Σ_j tables[j][codes[j]] — the m-lookup ADC score."""
    return F.aggregate(
        F.zip_with(codes_col, tables_col, lambda c, t: F.element_at(t, c + 1)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def pq_encode(
    corpus: DataFrame,
    codewords: list[list[int]],
    m: int,
    cid: str = "cid",
    cvec: str = "cvec",
) -> DataFrame:
    """Encode every corpus vector as ``m`` sub-codes: subspace j keeps
    components [j·d, (j+1)·d) (d = dim/m) and takes the codeword with
    the minimum exact-integer squared L2 distance on that slice (ties →
    smaller code id). Output: (cid, codes: array<int> length m).

    Plan shape: a NARROW map — the codebook ships in the task closure
    and the argmin is one vectorized Arrow hop (``_pq_codes_udf``), so
    encoding 10^12 vectors is zero-shuffle (the compression step never
    moves data)."""
    codes_udf = _pq_codes_udf(codewords, m)
    return corpus.select(
        F.col(cid).alias(cid), quantize(F.col(cvec)).alias("_q")
    ).select(F.col(cid), codes_udf(F.col("_q")).alias("codes"))


def pq_topk(
    queries: DataFrame,
    encoded: DataFrame,
    codewords: list[list[int]],
    m: int,
    k: int = 5,
    qid: str = "qid",
    qvec: str = "qvec",
    cid: str = "cid",
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k over PQ codes: each
    query precomputes an m×ncodes table of exact integer dots between
    its subvectors and every codeword's subvector (narrow, on the tiny
    broadcast query side); scoring a corpus vector is then m
    ``element_at`` lookups summed — no dim-length arithmetic touches
    the (huge) corpus side, and the corpus frame carries only the
    m-byte codes. Output: (qid, cid, adc_q, rank), rank ≤ k, ties by
    cid. Approximate by construction; recall is a pytest property (vs
    brute_topk), the encode→score arithmetic itself is oracle-exact."""
    tables = _pq_tables_expr(quantize(F.col(qvec)), codewords, m)
    q = queries.select(F.col(qid).alias("_qid"), tables.alias("_tab"))
    score = _pq_adc_score(F.col("codes"), F.col("_tab"))
    scored = encoded.join(F.broadcast(q), F.col("_qid").isNotNull()).select(
        "_qid", F.col(cid).alias("_cid"), score.alias("adc_q")
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("adc_q"), F.col("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias(qid), F.col("_cid").alias(cid), "adc_q", "rank")
    )


def ivfpq_encode(
    corpus: DataFrame,
    centroids: DataFrame,
    codewords: list[list[int]],
    m: int,
    cid: str = "cid",
    cvec: str = "cvec",
    residual: bool = True,
) -> DataFrame:
    """IVF-PQ index build: assign every corpus vector to its inverted
    list (``ivf_assign`` — one broadcast pass, one shuffled row per
    vector) and PQ-encode it to m sub-codes in the same projection.
    Output: (cid, list_id, codes) — the persistable index frame
    (``write_ivf_index``) that ``ivfpq_topk`` serves from.

    ``residual=True`` (the default, and the standard IVF-ADC design —
    Jégou et al. 2011 §III) encodes x − centroid(list) instead of raw
    x: the quantizer spends its 2^bits on within-list variance, which
    materially improves recall at equal m (VERDICT r03 #2; measured in
    test_pipeline_ops on a clustered 5k fixture). The centroid is
    re-joined broadcast (tiny), so the encode still adds no shuffle
    beyond the assignment's one row per vector. ``codewords`` must
    then quantize residuals (``ivfpq_codewords_from_sample``)."""
    assigned = ivf_assign(corpus, centroids, cid=cid, cvec=cvec)
    codes_udf = _pq_codes_udf(codewords, m)
    # the `_residual` literal rides along (constant-folded, RLE'd on
    # disk) so a PERSISTED index remembers which scoring decomposition
    # its codes expect — ivfpq_topk(encoded=...) refuses a mismatch
    # instead of silently mis-ranking (r04 review)
    if not residual:
        return assigned.select(
            F.col(cid), "list_id",
            codes_udf(F.col("_cv")).alias("codes"),
            F.lit(False).alias("_residual"),
        )
    cents = centroids.select(
        F.col("list_id"), quantize(F.col("center")).alias("_ctv")
    )
    return (
        assigned.join(F.broadcast(cents), "list_id")
        .select(
            F.col(cid), "list_id",
            F.zip_with(F.col("_cv"), F.col("_ctv"), lambda a, b: a - b).alias("_r"),
        )
        .select(
            F.col(cid), "list_id",
            codes_udf(F.col("_r")).alias("codes"),
            F.lit(True).alias("_residual"),
        )
    )


def ivfpq_codewords_from_sample(
    corpus: DataFrame,
    centroids: DataFrame,
    ncodes: int,
    cid: str = "cid",
    cvec: str = "cvec",
) -> list[list[int]]:
    """Deterministic RESIDUAL codebook for ``ivfpq_encode``: the
    residuals (x − assigned centroid, exact ints) of the ``ncodes``
    corpus vectors with the smallest engine-portable spread hash —
    the residual-space analogue of ``pq_codewords_from_sample``."""
    assigned = ivf_assign(corpus, centroids, cid=cid, cvec=cvec)
    cents = centroids.select(F.col("list_id"), quantize(F.col("center")).alias("_ctv"))
    spread = _spread_key(cid)
    rows = (
        assigned.join(F.broadcast(cents), "list_id")
        .select(
            F.zip_with(F.col("_cv"), F.col("_ctv"), lambda a, b: a - b).alias("_r"),
            spread.alias("_h"), F.col(cid).alias("_cid"),
        )
        .orderBy("_h", "_cid")
        .limit(ncodes)
        .collect()
    )
    return [[int(v) for v in r["_r"]] for r in rows]


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame | None,
    centroids: DataFrame,
    codewords: list[list[int]],
    m: int,
    k: int = 5,
    nprobe: int = 2,
    qid: str = "qid",
    cid: str = "cid",
    qvec: str = "qvec",
    cvec: str = "cvec",
    encoded: DataFrame | None = None,
    residual: bool = True,
    broadcast_probes: bool = True,
    check_residual: bool = True,
) -> DataFrame:
    """IVF-PQ — the standard composition at 10^12 vectors (Jégou et
    al. 2011): inverted-list probe reduction (IVF) × memory/arithmetic
    compression (PQ). A query probes its ``nprobe`` nearest lists and
    ADC-scores ONLY those lists' codes — m table lookups per candidate
    instead of a dim-length dot, over codes instead of vectors.

    RESIDUAL scoring (default, Jégou §III): codes quantize
    x − centroid, so the score decomposes exactly as
    ``dot(q, x) ≈ dot(q, centroid) + ADC(q, residual codes)`` — the
    per-list offset ``dot(q, centroid)`` is already computed by the
    probe ranking, so residual costs nothing extra at query time.

    INDEX LIFECYCLE (VERDICT r03 #1): pass ``encoded=`` (an
    ``ivfpq_encode`` result — same ``residual`` flag! — typically
    persisted via ``write_ivf_index``) to serve repeated query batches
    without re-scanning or re-quantizing the corpus; ``corpus`` may
    then be None. The flag compatibility of a passed index is
    aggregate-validated (min==max of ``_residual`` — a heterogeneous
    union/append is refused, ADVICE r04); ``check_residual=False``
    skips that one extra job for hot serving loops whose index was
    already validated at ``write_ivf_index``/``append_to_ivf_index``
    time.

    ``broadcast_probes=False`` (VERDICT r04 #2): as in ``ivf_topk`` —
    drop the probe-side broadcast hint for bulk |Q| so AQE plans a
    shuffle join on ``list_id``; the PQ probe rows additionally carry
    the m×ncodes ADC tables, which makes the broadcast blow-up
    earlier.

    Deterministic exact integer arithmetic end-to-end → closed-form
    SQL oracle (``ann_ivfpq``); recall vs brute force is the pytest
    property. Output: (qid, cid, adc_q, rank ≤ k, ties by cid)."""
    if encoded is None:
        if corpus is None:
            raise ValueError(
                "ivfpq_topk needs either corpus or a prebuilt encoded index"
            )
        encoded = ivfpq_encode(
            corpus, centroids, codewords, m, cid=cid, cvec=cvec, residual=residual
        )
    else:
        missing = {cid, "list_id", "codes"} - set(encoded.columns)
        if missing:
            raise ValueError(f"prebuilt encoded index lacks columns {sorted(missing)}")
        if check_residual:
            # refuse an index whose codes were built under the OTHER
            # scoring decomposition — the mismatch would mis-rank
            # silently (raw codes + centroid offset, or vice versa).
            # Aggregate-validated: a mixed-flag union/append raises
            # inside _residual_flag (ADVICE r04 — the old sampled
            # .first() let heterogeneous indexes through). The flag
            # resolved by read_ivf_index (table property — no job) is
            # honored when present, and an aggregate result is cached
            # on the frame, so a serving loop reusing one index frame
            # pays at most one validation job, not one per call.
            flag = getattr(encoded, "_gds_residual_flag", _UNSET)
            if flag is _UNSET:
                flag = _residual_flag(encoded)
                encoded._gds_residual_flag = flag
            if flag is not None and flag != residual:
                raise ValueError(
                    f"encoded index was built with residual={flag} but "
                    f"ivfpq_topk was called with residual={residual}"
                )
    cents = centroids.select(
        F.col("list_id").alias("_lid"), quantize(F.col("center")).alias("_ctv")
    )
    q = queries.select(F.col(qid).alias("_qid"), quantize(F.col(qvec)).alias("_qv"))
    qscored = q.join(F.broadcast(cents), F.lit(True)).select(
        "_qid", "_qv", "_lid", dot_int(F.col("_qv"), F.col("_ctv")).alias("_d")
    )
    wq = Window.partitionBy("_qid").orderBy(F.desc("_d"), F.col("_lid"))
    probes = (
        qscored.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select(
            "_qid",
            F.col("_lid").alias("list_id"),
            F.col("_d"),
            _pq_tables_expr(F.col("_qv"), codewords, m).alias("_tab"),
        )
    )
    adc = _pq_adc_score(F.col("codes"), F.col("_tab"))
    score = (F.col("_d") + adc) if residual else adc
    probe_side = F.broadcast(probes) if broadcast_probes else probes
    scored = encoded.join(probe_side, "list_id").select(
        "_qid", F.col(cid).alias("_cid"), score.alias("adc_q"),
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("adc_q"), F.col("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias(qid), F.col("_cid").alias(cid), "adc_q", "rank")
    )


def ivfpq_train(
    corpus: DataFrame,
    centroids: DataFrame,
    ncodes: int = 16,
    m: int = 8,
    iters: int = 2,
    cid: str = "cid",
    cvec: str = "cvec",
) -> list[list[int]]:
    """Lloyd-refined RESIDUAL codebooks for IVF-PQ (r04 — the training
    half of the residual design, Jégou §III): materialize the residual
    x − centroid(list) frame once (one ``ivf_assign`` pass + a
    broadcast centroid subtract, exact ints), rescale it into the
    quantizer's float domain (÷10⁴ — NOT exact in double, 1e-4 has no
    binary representation; the int round-trip still holds because
    ``quantize`` re-rounds and v/10⁴·10⁴ errs far below 0.5 ulp of the
    integer grid — ADVICE r04), and run the standard per-subspace
    Lloyd (``pq_train``) over it. Same bounded-driver contract: only
    the m·ncodes·d codebook leaves the cluster. Feed the result to
    ``ivfpq_encode``/``ivfpq_topk`` with ``residual=True``."""
    cents = centroids.select(F.col("list_id"), quantize(F.col("center")).alias("_ctv"))
    res = (
        ivf_assign(corpus, centroids, cid=cid, cvec=cvec)
        .join(F.broadcast(cents), "list_id")
        .select(
            F.col(cid),
            F.transform(
                F.zip_with(F.col("_cv"), F.col("_ctv"), lambda a, b: a - b),
                lambda v: v.cast("double") / 10000.0,
            ).alias(cvec),
        )
    )
    return pq_train(res, ncodes=ncodes, m=m, iters=iters, cid=cid, cvec=cvec)


def pq_train(
    corpus: DataFrame,
    ncodes: int = 16,
    m: int = 8,
    iters: int = 2,
    cid: str = "cid",
    cvec: str = "cvec",
) -> list[list[int]]:
    """Lloyd-refined PQ codebooks (per-subspace k-means, the training
    half of Jégou et al. 2011): start from the deterministic spread
    sample, then per round (a) re-encode every vector (narrow, the
    zero-shuffle ``_pq_codes_udf`` Arrow kernel), (b) recompute each codeword
    component as the rounded mean of its members — ONE distributed
    groupBy of (subspace, code, component) partial sums; only the
    m·ncodes·d fold (the codebook itself) reaches the driver, same
    bounded-driver contract as ivf_train. Codeword components stay
    quantized ints, so the refined codebook feeds the exact-integer
    encode/ADC path unchanged. Empty codes keep their previous
    codeword. Deterministic end-to-end (no RNG).

    What training guarantees is the k-means objective — total
    quantization error strictly decreases (asserted in tests). Top-k
    ADC recall usually follows at realistic corpus sizes but is NOT
    monotone in reconstruction error on tiny fixtures (measured on the
    500-vector sf0.01 table: 0.32 sample vs 0.29 after 2 Lloyd rounds
    — within noise; the test bounds the regression)."""
    cw = pq_codewords_from_sample(corpus, ncodes, cid, cvec)
    dim = len(cw[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    qv = quantize(F.col(cvec))
    for _ in range(max(0, iters)):
        codes_udf = _pq_codes_udf(cw, m)
        exploded = corpus.select(qv.alias("_q")).select(
            "_q", F.posexplode(codes_udf(F.col("_q"))).alias("sub", "code")
        )
        comp = exploded.select(
            "sub", "code",
            F.posexplode(F.slice(F.col("_q"), F.col("sub") * d + 1, d)).alias("pos", "val"),
        )
        rows = (
            comp.groupBy("sub", "code", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [list(c) for c in cw]
        for r in rows:
            new[int(r["code"])][int(r["sub"]) * d + int(r["pos"])] = int(
                round(int(r["s"]) / int(r["n"]))
            )
        cw = new
    return cw
