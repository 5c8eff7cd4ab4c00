"""Similarity search over embedding columns (array<float>).

Scoring is an integer dot product over vectors quantized to 1e-4
(floor) — on the unit-norm synthetic embeddings this ranks identically
to cosine, and integer arithmetic is bit-exact across engines and
across partition orders (a float dot's accumulation order is not).

- brute-force top-k: the correctness baseline; fact×queries
  broadcast nested-loop, fine when |queries| is small.
- IVF/LSH-bucketed top-k: sign-bit coarse quantization (8 planes →
  256 cells); probes only the query's cell. The 100 TB path: the
  bucket key is an equi-join key, so candidate generation shuffles
  O(n), never O(n²). Recall < 1 by design — documented tradeoff.
- near-dup pairs: label-blocked pair scan with a dot threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import table

QUANT = 10_000
N_QUERIES = 20
TOP_K = 5


def quantize(col) -> Column:
    """array<float> → array<bigint> at 1e-4 resolution (floor —
    engine-portable, unlike round)."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def int_dot(a, b) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sign_bucket(col, n_planes: int = 8) -> Column:
    """Coarse cell id: sign bits of the first n dims ('1' if ≥ 0)."""
    return F.concat(
        *[F.when(F.element_at(col, i + 1) >= 0, "1").otherwise("0") for i in range(n_planes)]
    )


_SQL_DOT = (
    "CAST(list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(floor(a.e[i] * 10000) AS BIGINT) * CAST(floor(b.e[i] * 10000) AS BIGINT))) AS BIGINT)"
)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k with the oracle-pinned tie-break (dot DESC,
    neighbor_id ASC) — ONE definition for all three ANN variants so
    the correctness-critical ordering cannot drift between them."""
    w = W.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "dot_q")
    )


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, {_SQL_DOT.replace("a.e", "q.e")} AS dot_q
        FROM q, v b WHERE b.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, dot_q
    FROM (
        SELECT query_id, neighbor_id, dot_q,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k by quantized dot product (= cosine on these
    unit-norm vectors): broadcast the small query set against the
    full collection, window top-k with id tie-break."""
    v = table(spark, sf_dir, "embeddings").select("vec_id", quantize(F.col("embedding")).alias("qe"))
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_emb")
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            int_dot(F.col("q_emb"), F.col("qe")).alias("dot_q"),
        )
    )
    return _topk(scored, TOP_K)


@register(
    "ann_ivf_bucketed_topk",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               {" || ".join(f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(8))} AS cell
        FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, {_SQL_DOT.replace("a.e", "q.e")} AS dot_q
        FROM q JOIN v b ON q.cell = b.cell AND b.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, dot_q
    FROM (
        SELECT query_id, neighbor_id, dot_q,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
)
def ann_ivf_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed ANN: sign-bit coarse cells (8 planes → 256),
    probe only the query's cell, top-3 within it. Candidate
    generation becomes an equi-join on the cell key — the scalable
    shape; recall is traded for the O(n) shuffle."""
    e = table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        quantize(F.col("embedding")).alias("qe"),
        sign_bucket(F.col("embedding")).alias("cell"),
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_emb"), "cell"
    )
    scored = (
        v.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            int_dot(F.col("q_emb"), F.col("qe")).alias("dot_q"),
        )
    )
    return _topk(scored, 3)


def hamming1_cells(cell: Column, n_planes: int = 8) -> Column:
    """The query's sign cell plus its ``n_planes`` hamming-1
    neighbors — classic LSH multi-probe (Lv et al. 2007): a near
    neighbor that disagrees on exactly one sign bit (a dimension near
    zero) lives in a hamming-1 cell, so probing those 9 of 2^8 cells
    (~3.5%) recovers most boundary misses at bounded cost."""
    cells = [cell]
    for i in range(1, n_planes + 1):
        flipped = F.when(F.substring(cell, i, 1) == "1", F.lit("0")).otherwise(F.lit("1"))
        cells.append(
            F.concat(
                F.substring(cell, 1, i - 1), flipped, F.substring(cell, i + 1, n_planes)
            )
        )
    return F.array(*cells)


_SQL_HAMMING1 = f"""
    pc AS (
        SELECT vec_id, cell FROM q
        UNION ALL
        SELECT q.vec_id,
               substr(q.cell, 1, t.i - 1)
               || (CASE WHEN substr(q.cell, t.i, 1) = '1' THEN '0' ELSE '1' END)
               || substr(q.cell, t.i + 1) AS cell
        FROM q, (SELECT unnest(generate_series(1, 8)) AS i) t
    )
"""


@register(
    "ann_ivf_bucketed_multiprobe",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               {" || ".join(f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(8))} AS cell
        FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < {N_QUERIES}),
    {_SQL_HAMMING1},
    scored AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, {_SQL_DOT.replace("a.e", "q.e")} AS dot_q
        FROM pc
        JOIN q ON q.vec_id = pc.vec_id
        JOIN v b ON b.cell = pc.cell AND b.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, dot_q
    FROM (
        SELECT query_id, neighbor_id, dot_q,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
)
def ann_ivf_bucketed_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bucket IVF with hamming-1 multi-probe: each query probes
    its own cell plus the 8 one-bit-flip cells — the standard LSH
    multi-probe shape, complementing the trained-centroid multi-probe
    (`ann_ivf_kmeans_multiprobe`). Probed cells are disjoint vector
    sets, so candidate generation stays a dedup-free equi-join on the
    cell key at 9/256 of the collection per query; measured recall@3
    vs brute force is in SCALE.md."""
    e = table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        quantize(F.col("embedding")).alias("qe"),
        sign_bucket(F.col("embedding")).alias("cell"),
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_emb"), "cell"
    )
    probed = q.select(
        "query_id", "q_emb", F.explode(hamming1_cells(F.col("cell"))).alias("cell")
    )
    scored = (
        v.join(F.broadcast(probed), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            int_dot(F.col("q_emb"), F.col("qe")).alias("dot_q"),
        )
    )
    return _topk(scored, 3)


K_MEANS_K = 8
K_MEANS_SCALE = 16


def _sql_int_dot(col: str, c: list[int]) -> str:
    """``int_dot(col, literal centroid)`` as a SQL fragment — the
    same zip_with/aggregate lambdas the Column form builds, with the
    centroid inlined as one array literal the JVM parses."""
    arr = ",".join(str(int(x)) for x in c)
    return (
        f"aggregate(zip_with({col}, array({arr}), (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def _kmeans_cell_expr(cents: list[list[int]]) -> Column:
    """Nearest-centroid id as a native expression from literal
    centroids: 8 integer dots, argmax with min-id tie-break via
    array_max over (dot, -cid) structs (lexicographic struct order).

    r13: assembled as ONE ``F.expr`` SQL string instead of nested
    Column builders — the k×d literal tree costs one py4j round-trip
    per ``F.lit``/lambda (~0.56 s per construction at k=8, d=64,
    measured), and kmeans_fit constructs it once per Lloyd round plus
    once for the final assignment; a single parsed string is ~30×
    cheaper to build with an identical analyzed expression."""
    structs = ",".join(
        f"named_struct('dot', {_sql_int_dot('qe', c)}, 'nj', {-j})"
        for j, c in enumerate(cents)
    )
    return F.expr(f"-array_max(array({structs})).nj").alias("cell")


def _pin_wide(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition a small-bytes/high-CPU relation to cluster width
    when it currently sits below it (same rule as the tagger's
    _pin_parallelism and word_shingles' pin): AQE coalesces by BYTES,
    so a 20K-vector relation from one parquet file lands on ONE
    partition and every n×k dot-product scan built on it runs
    single-core while 31 idle (r11 scale-point catch: the k=400
    SemDeDup Lloyd pass measured 218 s one-core vs ~4 s pinned)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism, *[F.col(c) for c in cols])
    return df


def _kmeans_cell_join(v: DataFrame, cents: list[list[int]]) -> DataFrame:
    """Nearest-centroid assignment via a broadcast centroid dim —
    the LARGE-k path. The literal-centroid expression compiles k×d
    literals into one projection; past ~64 centroids that expression
    tree becomes its own plan-size problem (SCALE.md lesson #3), so
    production-scale k (SemDeDup's k ∝ corpus size) enumerates
    vector×centroid candidates through a broadcast cross join and
    takes the per-vector argmax with a partial-aggregated max(struct)
    — shuffle O(n), map work O(n·k), identical assignments
    (differential-pinned by test_kmeans_assign_join_path_parity).

    The argmax aggregates the (dot, -cid) STRUCT ONLY and joins the
    vectors back by id afterwards (r11 scale-point catch): the
    previous shape carried the d-long ``qe`` array through the n×k
    candidate relation into a ``first(qe)`` aggregation buffer, which
    falls off hash aggregation onto a sort over n·k array-bearing
    rows. The dot stays the HOF ``int_dot`` on purpose: an unrolled
    64-term sum measured FASTER alone but pushed the fused
    crossjoin+agg+explode stage past the JVM's 64 KB codegen method
    limit, collapsing the whole stage to interpreted eval (218 s) —
    the lambda form keeps every stage inside codegen."""
    spark = v.sparkSession
    cent_df = spark.createDataFrame(
        [(j, c) for j, c in enumerate(cents)], "cid long, c array<long>"
    )
    scored = v.crossJoin(F.broadcast(cent_df)).select(
        "vec_id",
        F.struct(
            int_dot(F.col("qe"), F.col("c")).alias("dot"),
            (-F.col("cid")).alias("nj"),
        ).alias("s"),
    )
    cells = scored.groupBy("vec_id").agg((-F.max("s")["nj"]).alias("cell"))
    return v.join(cells, "vec_id").select("vec_id", "qe", "cell")


def kmeans_fit(
    v: DataFrame, iters: int = 1, k: int = K_MEANS_K, assign: str = "literal"
) -> tuple[list[list[int]], DataFrame]:
    """Deterministic integer k-means over (vec_id, qe): init = the
    first K vectors' quantized embeddings ×SCALE, then ``iters``
    Lloyd update+reassign rounds. All arithmetic is integer (sums,
    counts, floor-division centroids), so assignments are bit-exact
    across engines and partition orders — no float mean ever exists.

    Scale shape: assignment is a narrow map (literal centroids inside
    codegen — no join, no shuffle); the update aggregates k×d
    sufficient statistics (posexplode → groupBy(cell, pos) sum), a
    512-row result collected to the driver exactly like MLlib's
    aggregate-then-update step. Rounds are O(scan) each.

    ``assign='join'`` switches nearest-centroid assignment to the
    broadcast-centroid-dim argmax (``_kmeans_cell_join``) — required
    when ``k`` outgrows what a literal projection should carry
    (SemDeDup-style k ∝ n); assignments are identical.

    Returns ``(final_centroids, assigned_df)`` — the trained
    centroids are what multi-probe needs to rank a query's top-P
    cells (the top-1 cell IS the query's own assignment, so probing
    P=1 reduces exactly to the single-probe operator)."""
    assigner = (
        (lambda df, cs: df.withColumn("cell", _kmeans_cell_expr(cs)))
        if assign == "literal"
        else _kmeans_cell_join
    )
    # CPU-density pin (r11), JOIN PATH ONLY: the n·k·d dot-product
    # scans are small-bytes/high-CPU — exactly what AQE coalesces to
    # one core — and at production k (join path) a one-partition
    # input serialized the k=400 Lloyd pass to 218 s. The literal
    # path (k≤64, demo/oracle scale) measured the OPPOSITE: the pin's
    # probe+shuffle cost ~0.6 s against nothing saved
    # (ann_ivf_kmeans_topk isolated warm 1.6 → 2.2 s), so it stays
    # unpinned. Results are partitioning-independent either way
    # (per-row argmax, integer sums) — a pure physical choice.
    if assign == "join":
        v = _pin_wide(v, "vec_id")
    # init = the K smallest vec_ids (== vec_id 0..K-1 on the catalog
    # tables, which is what the SQL oracle hard-codes; robust to
    # non-contiguous ids on arbitrary input)
    init_rows = v.select("vec_id", "qe").orderBy("vec_id").limit(k).collect()
    cents = [[int(x) * K_MEANS_SCALE for x in r[1]] for r in init_rows]
    for _ in range(iters):
        # no persist: the per-round assignment feeds exactly ONE
        # action (the stats collect), so the n×k subtree appears once
        # in that plan either way — a persist here would cache the
        # full n-row assignment per Lloyd round while saving nothing
        # (r11 ADVICE; the r11 SemDeDup fix's load-bearing parts were
        # the struct-only argmax and _pin_wide, not this cache)
        assigned = assigner(v, cents)
        stats = (
            assigned.select("cell", F.posexplode("qe"))
            .groupBy("cell", "pos")
            .agg(F.sum("col").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        sums: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            sums.setdefault(int(r["cell"]), {})[int(r["pos"])] = (int(r["s"]), int(r["n"]))
        new_cents = []
        for j, old in enumerate(cents):
            dims = sums.get(j)
            if not dims:  # empty cell keeps its previous centroid
                new_cents.append(old)
                continue
            # exact floor division — Python int // matches the
            # oracle's (16s − mod)/n construction for either sign
            new_cents.append(
                [(K_MEANS_SCALE * dims[p][0]) // dims[p][1] for p in range(len(old))]
            )
        cents = new_cents
    return cents, assigner(v, cents)


def kmeans_assign(
    v: DataFrame, iters: int = 1, k: int = K_MEANS_K, assign: str = "literal"
) -> DataFrame:
    """``kmeans_fit`` when only the assignment is needed."""
    return kmeans_fit(v, iters=iters, k=k, assign=assign)[1]


def probe_cells(q_emb: str, cents: list[list[int]], nprobe: int) -> Column:
    """The query's top-``nprobe`` coarse cells by centroid dot
    (dot DESC, cid ASC — the same argmax order as assignment, so the
    first probed cell is always the query's own cell). Literal
    centroids keep this a narrow projection: sort the k (dot, -cid)
    structs lexicographically, slice P, recover the ids.

    ``q_emb`` is the embedding COLUMN NAME (r13: the expression is
    assembled as one F.expr SQL string for the same
    py4j-construction-cost reason as ``_kmeans_cell_expr``)."""
    structs = ",".join(
        f"named_struct('dot', {_sql_int_dot(q_emb, c)}, 'nj', {-j})"
        for j, c in enumerate(cents)
    )
    return F.expr(
        f"transform(slice(sort_array(array({structs}), false), 1, {int(nprobe)}),"
        " s -> -s.nj)"
    )


def _sql_kmeans_cells(k: int = 8) -> str:
    """The ``kmeans_assign(iters=1, k=k)`` oracle CTE chain for any
    k: init = the first k vec_ids ×SCALE, one exact-integer Lloyd
    round, reassign. Only the init predicate depends on k — the
    update/assign algebra is k-independent, so the k=8 demo oracle
    and the large-k production-path oracle share one definition."""
    return _SQL_KMEANS_CELLS_TMPL.replace("__K__", str(k))


_SQL_KMEANS_CELLS_TMPL = """
    v AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 10000) AS BIGINT)) AS qe
        FROM embeddings
    ),
    c0 AS (
        SELECT vec_id AS cid, list_transform(qe, x -> x * 16) AS c
        FROM v WHERE vec_id < __K__
    ),
    d1 AS (
        SELECT v.vec_id, c.cid,
               CAST(list_sum(list_transform(generate_series(1, 64),
                                            i -> v.qe[i] * c.c[i])) AS BIGINT) AS dot
        FROM v, c0 c
    ),
    a1 AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dot DESC, cid ASC) AS rn
            FROM d1
        ) WHERE rn = 1
    ),
    e1 AS (
        SELECT a1.cell, i.i AS pos, v.qe[i.i] AS x
        FROM a1 JOIN v USING (vec_id),
             (SELECT unnest(generate_series(1, 64)) AS i) i
    ),
    s1 AS (
        SELECT cell, pos, CAST(sum(x) AS BIGINT) AS s, count(*) AS n
        FROM e1 GROUP BY cell, pos
    ),
    c1 AS (
        SELECT cell AS cid,
               list(CAST((16 * s - ((((16 * s) % n) + n) % n)) / n AS BIGINT)
                    ORDER BY pos) AS c
        FROM s1 GROUP BY cell
    ),
    cc AS (
        SELECT c0.cid, COALESCE(c1.c, c0.c) AS c
        FROM c0 LEFT JOIN c1 ON c1.cid = c0.cid
    ),
    d2 AS (
        SELECT v.vec_id, c.cid,
               CAST(list_sum(list_transform(generate_series(1, 64),
                                            i -> v.qe[i] * c.c[i])) AS BIGINT) AS dot
        FROM v, cc c
    ),
    a2 AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dot DESC, cid ASC) AS rn
            FROM d2
        ) WHERE rn = 1
    )
"""

_SQL_KMEANS_CELLS = _sql_kmeans_cells(K_MEANS_K)


@register(
    "ann_ivf_kmeans_topk",
    oracle=f"""
    WITH {_SQL_KMEANS_CELLS},
    q AS (
        SELECT v.vec_id, v.qe, a2.cell
        FROM v JOIN a2 USING (vec_id) WHERE v.vec_id < {N_QUERIES}
    ),
    cand AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, 64),
                                            i -> q.qe[i] * bv.qe[i])) AS BIGINT) AS dot_q
        FROM q
        JOIN a2 b ON b.cell = q.cell AND b.vec_id <> q.vec_id
        JOIN v bv ON bv.vec_id = b.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, dot_q
    FROM (
        SELECT query_id, neighbor_id, dot_q,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
        FROM cand
    ) WHERE rnk <= 3
    """,
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with TRAINED coarse centroids: deterministic integer
    k-means (k=8, one Lloyd round — init from the first k vectors,
    sum/count statistics, floor-division centroid update), then probe
    only the query's cell, top-3 by quantized dot. Upgrades the
    sign-bit cells of ``ann_ivf_bucketed_topk``: data-adaptive cells
    give balanced partitions on clustered embeddings (sign-bit cells
    collapse when mass concentrates in an orthant), while candidate
    generation stays an equi-join on the cell id — the O(n)-shuffle
    IVF shape used at 100 TB, with training cost O(iters · scan)."""
    return _ivf_kmeans_topk(spark, sf_dir, nprobe=1)


def _probe_cells_join(q: DataFrame, cents: list[list[int]], nprobe: int) -> DataFrame:
    """Top-``nprobe`` cells per query via a broadcast centroid dim —
    the large-k probe path (same reason as ``_kmeans_cell_join``: a
    k×d literal projection stops being a reasonable plan when k grows
    with the corpus). Same (dot DESC, cid ASC) order as the literal
    expression and the assignment argmax."""
    spark = q.sparkSession
    cent_df = spark.createDataFrame(
        [(j, c) for j, c in enumerate(cents)], "cid long, c array<long>"
    )
    scored = q.crossJoin(F.broadcast(cent_df)).select(
        "query_id", "q_emb", "cid", int_dot(F.col("q_emb"), F.col("c")).alias("dot")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", F.col("cid").alias("cell"))
    )


def _ivf_kmeans_topk(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int,
    k: int = K_MEANS_K,
    assign: str = "literal",
) -> DataFrame:
    """Trained-centroid IVF top-3, probing the query's top-``nprobe``
    coarse cells (FAISS's multi-probe shape). Each base vector lives
    in exactly one cell, so the P probed candidate sets are disjoint —
    the probe explode needs no dedup, and candidate volume grows as
    ~P/k of the collection per query, still an equi-join on the cell
    key. ``nprobe=1`` is exactly the classic single-probe operator
    (the top-1 cell by centroid dot IS the assignment argmax)."""
    e = table(spark, sf_dir, "embeddings")
    # persist the quantized vectors: consumed by the init collect, the
    # training round (assign + statistics), the final assignment, and
    # both probe sides; checkpoint the final assignment so the
    # 512-literal centroid dot expression compiles once, not once per
    # downstream consumer
    v = e.select("vec_id", quantize(F.col("embedding")).alias("qe")).persist()
    cents, assigned = kmeans_fit(v, iters=1, k=k, assign=assign)
    cells = assigned.localCheckpoint(eager=True)
    v.unpersist()  # cells is materialized; nothing downstream reads v
    if nprobe == 1:
        # the top-1 probe cell IS the assignment argmax — reuse the
        # cell already materialized on the query row instead of
        # compiling the k×d-literal probe expression a second time
        # (r8: this was the r7 refactor's +22% on the single-probe
        # headline query — the probe stage, not the checkpoint)
        probed = cells.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("qe").alias("q_emb"), "cell"
        )
    else:
        q = cells.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("qe").alias("q_emb")
        )
        if assign == "literal":
            probed = q.select(
                "query_id",
                "q_emb",
                F.explode(probe_cells("q_emb", cents, nprobe)).alias("cell"),
            )
        else:
            probed = _probe_cells_join(q, cents, nprobe)
    scored = (
        cells.join(F.broadcast(probed), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            int_dot(F.col("q_emb"), F.col("qe")).alias("dot_q"),
        )
    )
    return _topk(scored, 3)


IVF_NPROBE = 3
IVF_MULTIPROBE_K = 40
# The embeddings corpus size at the driver's oracle SF (sf0.01). The
# multi-probe oracles embed IVF_MULTIPROBE_K as a static literal while
# the operator derives k = ivf_k_for(n) live; the import-time assert
# below plus the runtime assert in ann_ivf_kmeans_multiprobe make the
# coupling loud: if the oracle corpus size OR the √n policy changes,
# the gate fails with a message instead of silently hash-mismatching.
ORACLE_CORPUS_N = 500

# --- corpus-derived coarse-cell count (r8, VERDICT #5) ---------------------
# The repo's measured lesson #1 (SCALE.md): recall comes from k
# tracking corpus size FIRST, then a small nprobe — multi-probe cannot
# rescue too-coarse cells. Policy: k = 1.8·√n (the FAISS-style √n
# rule; the 1.8 coefficient makes the policy reproduce the measured
# k=40 sweet spot at the n=500 oracle corpus), floored at the k-means
# demo k and capped by a broadcast-bytes budget for the centroid dim —
# the quantity that actually limits k at 100 TB, since both the
# assignment and probe paths broadcast k×VEC_DIM int64 centroids.
IVF_K_COEFF = 1.8
VEC_DIM = 64
IVF_MAX_CENTROID_BYTES = 4 << 20  # 4 MiB → k ≤ 8192 at 64 dims


def ivf_k_for(n: int) -> int:
    """k for an n-vector collection: clamp(int(1.8·√n), 8, bytes cap).
    ivf_k_for(500) == IVF_MULTIPROBE_K == 40, so the static sf0.01
    oracles (which must embed k in generated SQL) keep gating the
    policy path exactly; pinned by tests/test_kmeans_ivf.py."""
    cap = max(8, IVF_MAX_CENTROID_BYTES // (VEC_DIM * 8))
    return max(8, min(cap, int(IVF_K_COEFF * n**0.5)))


assert ivf_k_for(ORACLE_CORPUS_N) == IVF_MULTIPROBE_K, (
    "ivf_k_for policy no longer reproduces the static oracle k at the "
    "oracle corpus size — regenerate the multi-probe oracle SQL"
)


def _sql_multiprobe_cand(nprobe: int) -> str:
    """Oracle CTEs for the multi-probe candidate relation, appended
    after ``_SQL_KMEANS_CELLS`` (uses its ``v``/``cc``/``a2``):
    rank the final centroids per query, keep the top-``nprobe`` cells,
    union those cells' members."""
    return f"""
    q AS (SELECT vec_id, qe FROM v WHERE vec_id < {N_QUERIES}),
    qdot AS (
        SELECT q.vec_id, c.cid,
               CAST(list_sum(list_transform(generate_series(1, 64),
                                            i -> q.qe[i] * c.c[i])) AS BIGINT) AS dot
        FROM q, cc c
    ),
    qcells AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dot DESC, cid ASC) AS rn
            FROM qdot
        ) WHERE rn <= {nprobe}
    ),
    cand AS (
        SELECT qc.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, 64),
                                            i -> q.qe[i] * bv.qe[i])) AS BIGINT) AS dot_q
        FROM qcells qc
        JOIN q ON q.vec_id = qc.vec_id
        JOIN a2 b ON b.cell = qc.cell AND b.vec_id <> qc.vec_id
        JOIN v bv ON bv.vec_id = b.vec_id
    )
    """


@register(
    "ann_ivf_kmeans_multiprobe",
    oracle=f"""
    WITH {_sql_kmeans_cells(IVF_MULTIPROBE_K)},
    {_sql_multiprobe_cand(IVF_NPROBE)}
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, dot_q
    FROM (
        SELECT query_id, neighbor_id, dot_q,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
        FROM cand
    ) WHERE rnk <= 3
    """,
)
def ann_ivf_kmeans_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF at production shape: CORPUS-DERIVED k
    (``ivf_k_for`` — 1.8·√n, r8) trained cells through the
    broadcast-dim assignment AND probe paths (no literal centroid
    projections anywhere), queries probe their top-3 cells. Why:
    single-probe k=8 measured recall@3 = 0.52
    (``ann_ivf_recall_report``) — half the true neighbors missed;
    finer cells + multi-probe measured 0.93 at n=500 (k=40, 7.5%
    probe fraction) and 0.9+ holding at n=2000 (k=80, 3.75%) — the
    curve is in SCALE.md, measured by
    ``ann_ivf_multiprobe_recall_report``. The √n policy keeps the
    per-query scanned fraction FALLING as the corpus grows
    (nprobe/k ∝ 1/√n) at constant-ish recall. Candidate generation
    stays an equi-join on the cell key — the probed cells are
    disjoint, so the explode needs no dedup. The count() that sizes k
    is one columnless scan — noise next to training. At the n=500
    oracle corpus ivf_k_for gives exactly the k=40 the static oracle
    SQL embeds, so the gate keeps checking this very path."""
    n = table(spark, sf_dir, "embeddings").count()
    k = ivf_k_for(n)
    # The static oracle embeds IVF_MULTIPROBE_K; at the oracle corpus
    # the live policy MUST reproduce it or the gate stops checking
    # this path (ADVICE r8). Fail loudly rather than hash-mismatch.
    if n == ORACLE_CORPUS_N:
        assert k == IVF_MULTIPROBE_K, (
            f"ivf_k_for({n})={k} != static oracle k={IVF_MULTIPROBE_K}"
        )
    return _ivf_kmeans_topk(spark, sf_dir, nprobe=IVF_NPROBE, k=k, assign="join")


# Cosine near-dup threshold on the quantized integer dot: 0.95·QUANT².
# ONE constant shared by the Spark operators and every oracle below
# (and by curation's embedding cluster oracle) so the pair relation
# can never drift between the pair and cluster views.
NEAR_DUP_DOT_MIN = 95_000_000

# SQL fragment: the label-blocked exact near-dup pair relation.
_SQL_EMB_PAIRS = f"""
    v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    emb_pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
               {_SQL_DOT} AS dot_q
        FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_SQL_DOT} >= {NEAR_DUP_DOT_MIN}
    )
"""


@register(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH {_SQL_EMB_PAIRS}
    SELECT vec_a, vec_b, label, dot_q FROM emb_pairs
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicates: label-blocked pair scan,
    quantized dot ≥ 0.95·QUANT² (unit-norm ⇒ cosine ≥ ~0.95). The
    blocking key bounds the pair space exactly like LSH bands do for
    text."""
    return near_dup_pairs_exact(table(spark, sf_dir, "embeddings"))


def near_dup_pairs_exact(embeddings: DataFrame) -> DataFrame:
    """The exact near-dup pair core over any
    (vec_id, label, embedding) relation."""
    v = embeddings.select("vec_id", "label", quantize(F.col("embedding")).alias("qe"))
    a = v.select(F.col("vec_id").alias("vec_a"), "label", F.col("qe").alias("ea"))
    b = v.select(F.col("vec_id").alias("vec_b"), "label", F.col("qe").alias("eb"))
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "label", int_dot(F.col("ea"), F.col("eb")).alias("dot_q"))
        .filter(F.col("dot_q") >= NEAR_DUP_DOT_MIN)
    )


@register(
    "embedding_near_dup_lsh",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
               {" || ".join(f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(8))} AS cell
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label, {_SQL_DOT} AS dot_q
    FROM v a JOIN v b ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE {_SQL_DOT} >= {NEAR_DUP_DOT_MIN}
    """,
)
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup, scale path: block by (label, sign-bucket)
    instead of label alone. The exact variant's within-label pair
    space grows quadratically with the label population — measured
    112 s at 10× sf0.1 (20K vectors) vs 2 s for this shape — while
    the 8-plane cell key cuts each block ~256× and keeps candidate
    generation an equi-join. Recall < 1 by design (a ≥0.95-cosine
    pair CAN disagree on a sign bit when a dimension sits near zero);
    the exact operator remains the verification tier, run on THESE
    candidates at scale. Same integer-dot determinism as the rest of
    the ANN family."""
    return near_dup_pairs_lsh(table(spark, sf_dir, "embeddings"))


def near_dup_pairs_lsh(embeddings: DataFrame) -> DataFrame:
    """The (label, sign-cell)-blocked near-dup pair core over any
    (vec_id, label, embedding) relation."""
    v = embeddings.select(
        "vec_id", "label",
        quantize(F.col("embedding")).alias("qe"),
        sign_bucket(F.col("embedding")).alias("cell"),
    )
    a = v.select(F.col("vec_id").alias("vec_a"), "label", "cell", F.col("qe").alias("ea"))
    b = v.select(F.col("vec_id").alias("vec_b"), "label", "cell", F.col("qe").alias("eb"))
    return (
        a.join(b, ["label", "cell"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "label", int_dot(F.col("ea"), F.col("eb")).alias("dot_q"))
        .filter(F.col("dot_q") >= NEAR_DUP_DOT_MIN)
    )


# Planted twins: the synthetic corpus's organic vectors never reach
# 0.95 cosine (judge-verified in DuckDB), so the two entries above
# return 0 rows at sf0.01 and their green hashes prove schema only.
# Cloning every 50th vector at vec_id + 1e6 (same label ⇒ survives
# the label block; same embedding ⇒ same sign cell ⇒ survives the
# LSH block) plants a known non-empty pair set — the same device
# the SemDeDup oracles use.
_SQL_EMB_PLANTED = """
    emb0 AS (SELECT vec_id, label, embedding FROM embeddings),
    embeddings_planted AS (
        SELECT vec_id, label, embedding FROM emb0
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, label, embedding
        FROM emb0 WHERE vec_id % 50 = 0
    )
"""


def _near_dup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e0 = table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    return e0.unionAll(
        e0.filter(F.col("vec_id") % 50 == 0).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "label", "embedding"
        )
    )


@register(
    "embedding_near_dup_pairs_planted",
    oracle=f"""
    WITH {_SQL_EMB_PLANTED},
    {_SQL_EMB_PAIRS.replace("FROM embeddings", "FROM embeddings_planted")}
    SELECT vec_a, vec_b, label, dot_q FROM emb_pairs
    """,
)
def embedding_near_dup_pairs_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``embedding_near_dup_pairs`` over the clone-planted corpus —
    non-empty by construction (each clone pairs with its original at
    dot ≈ QUANT²), so the hash gates the pair semantics, not just the
    schema."""
    return near_dup_pairs_exact(_near_dup_planted(spark, sf_dir))


@register(
    "embedding_near_dup_lsh_planted",
    oracle=f"""
    WITH {_SQL_EMB_PLANTED},
    v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
               {" || ".join(f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(8))} AS cell
        FROM embeddings_planted
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label, {_SQL_DOT} AS dot_q
    FROM v a JOIN v b ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE {_SQL_DOT} >= {NEAR_DUP_DOT_MIN}
    """,
)
def embedding_near_dup_lsh_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``embedding_near_dup_lsh`` over the clone-planted corpus: an
    exact clone shares every sign bit, so the LSH block must recover
    every planted pair — recall 1.0 on the plant is part of what the
    hash now verifies."""
    return near_dup_pairs_lsh(_near_dup_planted(spark, sf_dir))


@register(
    "semantic_dedup_semdedup",
    oracle=f"""
    WITH emb0 AS (SELECT vec_id, embedding FROM embeddings),
    embeddings_planted AS (
        SELECT vec_id, embedding FROM emb0
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, embedding
        FROM emb0 WHERE vec_id % 50 = 0
    ),
    {_SQL_KMEANS_CELLS.replace("FROM embeddings", "FROM embeddings_planted")},
    drops AS (
        SELECT DISTINCT b.vec_id AS drop_id
        FROM a2 a
        JOIN a2 b ON b.cell = a.cell AND a.vec_id < b.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id
        WHERE CAST(list_sum(list_transform(generate_series(1, 64),
                                           i -> va.qe[i] * vb.qe[i])) AS BIGINT)
              >= {NEAR_DUP_DOT_MIN}
    )
    SELECT a2.vec_id,
           CAST(a2.cell AS BIGINT) AS cell,
           (d.drop_id IS NULL) AS kept
    FROM a2 LEFT JOIN drops d ON d.drop_id = a2.vec_id
    """,
)
def semantic_dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings with k-means,
    then search for near-duplicates ONLY within each cluster and keep
    one representative per duplicate group (here: the lowest vec_id —
    any vector cosine-≥0.95-close to a lower-id vector in its cell is
    dropped). Reuses the deterministic integer k-means
    (``kmeans_assign`` — bit-exact across engines) and the shared
    NEAR_DUP_DOT_MIN threshold, so the pair relation cannot drift from
    the embedding near-dup operators. Scale shape: the cluster id is
    the blocking key — candidate generation is an equi-self-join on
    cell, and with k grown ∝ corpus size the per-cell pair space stays
    bounded (the paper's 50K-cluster regime); assignment itself is a
    shuffle-free literal-centroid map. Returns every vector with its
    cell and kept flag (the keep-list form curation composes). Every
    50th vector is planted as an exact clone (vec_id + 1e6) so the
    synthetic corpus — whose organic vectors never reach 0.95 cosine
    — exercises a non-empty drop set; each clone lands in its
    original's cell and is dropped as the higher id."""
    return semdedup_keeplist(
        _semdedup_planted(spark, sf_dir), k=K_MEANS_K, assign="literal"
    )


def _semdedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle corpus: embeddings plus an exact clone of every
    50th vector at vec_id + 1e6 (the synthetic corpus's organic
    vectors never reach 0.95 cosine, so without the clones the drop
    set would be empty and the gate trivial)."""
    e0 = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e0.unionAll(
        e0.filter(F.col("vec_id") % 50 == 0).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )


def semdedup_keeplist(
    embeddings: DataFrame, k: int = K_MEANS_K, assign: str = "literal"
) -> DataFrame:
    """The SemDeDup core over any (vec_id, embedding) relation:
    k-means cells → within-cell near-dup pairs → keep the lowest
    vec_id of each duplicate group. ``assign='join'`` selects the
    broadcast-centroid-dim argmax — the production path when k grows
    with the corpus (the paper's 50K-cluster regime), where a literal
    k×d projection would blow up the plan. Assignments are identical
    either way (parity-pinned); both paths are oracle-gated
    (semantic_dedup_semdedup at k=8 literal,
    semantic_dedup_semdedup_largek at k=40 join)."""
    v = embeddings.select("vec_id", quantize(F.col("embedding")).alias("qe")).persist()
    cells = kmeans_assign(v, iters=1, k=k, assign=assign).localCheckpoint(eager=True)
    v.unpersist()
    a = cells.select(F.col("vec_id").alias("vec_a"), "cell", F.col("qe").alias("ea"))
    b = cells.select(F.col("vec_id").alias("vec_b"), "cell", F.col("qe").alias("eb"))
    drops = (
        a.join(b, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(int_dot(F.col("ea"), F.col("eb")) >= NEAR_DUP_DOT_MIN)
        .select(F.col("vec_b").alias("drop_id"))
        .distinct()
    )
    return (
        cells.join(drops, cells.vec_id == drops.drop_id, "left")
        .select(
            "vec_id",
            F.col("cell").cast("bigint").alias("cell"),
            F.col("drop_id").isNull().alias("kept"),
        )
    )


SEMDEDUP_LARGE_K = 40


@register(
    "semantic_dedup_semdedup_largek",
    oracle=f"""
    WITH emb0 AS (SELECT vec_id, embedding FROM embeddings),
    embeddings_planted AS (
        SELECT vec_id, embedding FROM emb0
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, embedding
        FROM emb0 WHERE vec_id % 50 = 0
    ),
    {_sql_kmeans_cells(SEMDEDUP_LARGE_K).replace("FROM embeddings", "FROM embeddings_planted")},
    drops AS (
        SELECT DISTINCT b.vec_id AS drop_id
        FROM a2 a
        JOIN a2 b ON b.cell = a.cell AND a.vec_id < b.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id
        WHERE CAST(list_sum(list_transform(generate_series(1, 64),
                                           i -> va.qe[i] * vb.qe[i])) AS BIGINT)
              >= {NEAR_DUP_DOT_MIN}
    )
    SELECT a2.vec_id,
           CAST(a2.cell AS BIGINT) AS cell,
           (d.drop_id IS NULL) AS kept
    FROM a2 LEFT JOIN drops d ON d.drop_id = a2.vec_id
    """,
)
def semantic_dedup_semdedup_largek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup through the PRODUCTION assignment path: k=40
    centroids via the broadcast-centroid-dim argmax
    (``assign='join'``) instead of the k=8 literal projection — the
    shape a corpus-proportional k requires. Hash-gating this entry
    means the large-k code path, not just the demo path, is proven
    bit-exact against the oracle (same planted clones, same keep
    rule)."""
    return semdedup_keeplist(
        _semdedup_planted(spark, sf_dir), k=SEMDEDUP_LARGE_K, assign="join"
    )


@register(
    "ann_ivf_recall_report",
    oracle=f"""
    WITH {_SQL_KMEANS_CELLS},
    kq AS (
        SELECT v.vec_id, v.qe, a2.cell
        FROM v JOIN a2 USING (vec_id) WHERE v.vec_id < {N_QUERIES}
    ),
    kcand AS (
        SELECT kq.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, 64),
                                            i -> kq.qe[i] * bv.qe[i])) AS BIGINT) AS dot_q
        FROM kq
        JOIN a2 b ON b.cell = kq.cell AND b.vec_id <> kq.vec_id
        JOIN v bv ON bv.vec_id = b.vec_id
    ),
    ivf AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
            FROM kcand
        ) WHERE rnk <= 3
    ),
    bq AS (SELECT vec_id, qe FROM v WHERE vec_id < {N_QUERIES}),
    bscored AS (
        SELECT bq.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, 64),
                                            i -> bq.qe[i] * b.qe[i])) AS BIGINT) AS dot_q
        FROM bq, v b WHERE b.vec_id <> bq.vec_id
    ),
    brute AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
            FROM bscored
        ) WHERE rnk <= 3
    )
    SELECT b.query_id,
           CAST(count(*) AS BIGINT) AS n_expected,
           CAST(count(i.neighbor_id) AS BIGINT) AS n_hits
    FROM brute b LEFT JOIN ivf i
      ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
)
def ann_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the trained-k-means IVF path against the exact
    brute-force baseline, per query — recall is a MEASURED quantity
    here, not a guessed one (the IVF tradeoff SCALE.md documents:
    probing one coarse cell trades recall for the O(n) shuffle; this
    operator is how a production deployment would monitor that trade
    on real data). Composes the two existing oracle-exact rankings
    and counts the overlap; both rankings are integer-deterministic,
    so the recall report itself is hash-exact."""
    return _recall_report(spark, sf_dir, ann_ivf_kmeans_topk(spark, sf_dir))


def _recall_report(spark: SparkSession, sf_dir: str, ivf_df: DataFrame) -> DataFrame:
    """Per-query recall@3 of any approximate ranking vs the exact
    brute-force baseline."""
    brute = ann_cosine_topk(spark, sf_dir).filter(F.col("rank") <= 3).select(
        "query_id", "neighbor_id"
    )
    ivf = ivf_df.select("query_id", F.col("neighbor_id").alias("ivf_neighbor_id"))
    return (
        brute.join(
            ivf,
            (brute.query_id == ivf.query_id)
            & (brute.neighbor_id == ivf.ivf_neighbor_id),
            "left",
        )
        .select(brute.query_id.alias("query_id"), "neighbor_id", "ivf_neighbor_id")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_expected"),
            F.count("ivf_neighbor_id").cast("bigint").alias("n_hits"),
        )
    )


@register(
    "ann_ivf_multiprobe_recall_report",
    oracle=f"""
    WITH {_sql_kmeans_cells(IVF_MULTIPROBE_K)},
    {_sql_multiprobe_cand(IVF_NPROBE)},
    ivf AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
            FROM cand
        ) WHERE rnk <= 3
    ),
    bq AS (SELECT vec_id, qe FROM v WHERE vec_id < {N_QUERIES}),
    bscored AS (
        SELECT bq.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, 64),
                                            i -> bq.qe[i] * b.qe[i])) AS BIGINT) AS dot_q
        FROM bq, v b WHERE b.vec_id <> bq.vec_id
    ),
    brute AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
            FROM bscored
        ) WHERE rnk <= 3
    )
    SELECT b.query_id,
           CAST(count(*) AS BIGINT) AS n_expected,
           CAST(count(i.neighbor_id) AS BIGINT) AS n_hits
    FROM brute b LEFT JOIN ivf i
      ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
)
def ann_ivf_multiprobe_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the k=40/nprobe=3 multi-probe IVF path vs brute
    force — the instrument that justifies the default: single-probe
    k=8 measured 0.52 here, this configuration 0.93 at a 7.5% probe
    fraction; the full curve is in SCALE.md. Hash-exact like the
    single-probe report."""
    return _recall_report(
        spark, sf_dir, ann_ivf_kmeans_multiprobe(spark, sf_dir)
    )
