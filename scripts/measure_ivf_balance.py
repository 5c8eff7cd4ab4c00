"""Measure IVF (k-means) cell-size balance under the deterministic
init (r9, VERDICT #4): first-K-vectors init + N Lloyd rounds vs a
stride-stratified init, on the real sf embeddings AND a deliberately
clustered synthetic set (the known-weak case for first-K init: the
first K vectors may all come from one cluster).

Reports per configuration: non-empty cells, max/mean cell size,
p99/mean, and the expected probe fraction for nprobe=3 (mean over
queries of the probed cells' share of the corpus — the quantity that
actually prices a probe).

Usage: python scripts/measure_ivf_balance.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from pids_drg_esoa_spark.operators.similarity import (  # noqa: E402
    K_MEANS_SCALE,
    _kmeans_cell_join,
    ivf_k_for,
    kmeans_fit,
    quantize,
)
from pids_drg_esoa_spark.session import get_spark  # noqa: E402


def stride_init(v: DataFrame, k: int) -> list[list[int]]:
    """Deterministic stratified init: k vectors at equal vec_id-rank
    strides across the collection (rank i·n/k), instead of the first
    k. SQL-expressible (row_number + modulo) so it could sit behind
    the oracle gate if adopted."""
    n = v.count()
    stride = max(1, n // k)
    w = F.row_number().over(__import__("pyspark").sql.window.Window.orderBy("vec_id"))
    rows = (
        v.select("vec_id", "qe", (w - 1).alias("rnk"))
        .filter((F.col("rnk") % stride == 0) & (F.col("rnk") < stride * k))
        .orderBy("rnk")
        .collect()
    )
    return [[int(x) * K_MEANS_SCALE for x in r["qe"]] for r in rows[:k]]


def lloyd(v: DataFrame, cents: list[list[int]], iters: int) -> DataFrame:
    """Run extra Lloyd rounds from given centroids, return assigned."""
    for _ in range(max(iters, 0)):
        assigned = _kmeans_cell_join(v, cents)
        stats = (
            assigned.select("cell", F.posexplode("qe"))
            .groupBy("cell", "pos")
            .agg(F.sum("col").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        sums: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            sums.setdefault(int(r["cell"]), {})[int(r["pos"])] = (int(r["s"]), int(r["n"]))
        cents = [
            [(K_MEANS_SCALE * sums[j][p][0]) // sums[j][p][1] for p in range(len(old))]
            if j in sums else old
            for j, old in enumerate(cents)
        ]
    return _kmeans_cell_join(v, cents)


def report(name: str, v: DataFrame, assigned: DataFrame, k: int) -> None:
    sizes = sorted(
        r["n"] for r in assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    n = sum(sizes)
    mean = n / k
    p99 = sizes[min(len(sizes) - 1, int(0.99 * len(sizes)))] if sizes else 0
    # expected nprobe=3 probe fraction = sum over cells of
    # P(query in probing set of cell) · size — approximate with the
    # size-weighted self-probe (a query's own cell is always probed;
    # the other two probed cells are its neighbors): upper-bound with
    # 3 largest / n (worst query) and size-weighted own-cell share.
    own = sum(s * s for s in sizes) / (n * n)
    worst3 = sum(sizes[-3:]) / n
    print(
        f"  {name:32s} cells {len(sizes):4d}/{k:<4d} max/mean "
        f"{sizes[-1] / mean:6.2f}  p99/mean {p99 / mean:6.2f}  "
        f"own-cell E[frac] {own:6.4f}  worst-3 {worst3:6.4f}"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ivf_balance")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", quantize(F.col("embedding")).alias("qe"))
    n = emb.count()
    k = ivf_k_for(n)
    print(f"real embeddings {sf_dir}: n={n}, policy k={k}")
    cents, assigned = kmeans_fit(emb, iters=1, k=k, assign="join")
    report("first-K + 1 Lloyd (production)", emb, assigned, k)
    report("first-K + 2 Lloyd", emb, lloyd(emb, cents, 1), k)
    s_cents = stride_init(emb, k)
    report("stride init + 1 Lloyd", emb, lloyd(emb, s_cents, 1), k)

    # deliberately clustered synthetic ON THE UNIT SPHERE (the engine's
    # k-means assigns by max inner product — the embeddings contract is
    # unit-norm, so a non-normalized synthetic degenerates to whichever
    # centroid has the largest norm): 16 unit centers, power-law sizes,
    # small angular jitter. Cluster id from md5 so the FIRST k vec_ids
    # still span clusters; the skew is in the SIZES (4 clusters carry
    # half the mass).
    import math
    import random as _random

    n2 = 4096
    k2 = ivf_k_for(n2)
    dims = 64
    rng = _random.Random(9)
    centers = []
    for _ in range(16):
        raw = [rng.gauss(0, 1) for _ in range(dims)]
        nrm = math.sqrt(sum(x * x for x in raw))
        centers.append([x / nrm for x in raw])
    # quantized unit centers (QUANT=10_000 like operators.quantize)
    qcenters = F.array(*[
        F.array(*[F.lit(int(x * 10_000)) for x in c]) for c in centers
    ])
    cl = (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 16)
    # power-law reweight: fold half the clusters down so sizes skew
    cl = F.when(cl < 8, cl % 4).otherwise(cl)
    jit = lambda d: (F.col("id") * (d * 2 + 7)) % 401 - 200  # noqa: E731  (±2% of QUANT)
    vec = F.array(*[
        (F.element_at(F.element_at(qcenters, F.col("c").cast("int") + 1), d + 1)
         + jit(d)).cast("long")
        for d in range(dims)
    ])
    syn = (
        spark.range(n2)
        .withColumn("c", cl)
        .select(F.col("id").alias("vec_id"), vec.alias("qe"), "c")
    )
    truth = {r["c"]: r["n"] for r in syn.groupBy("c").count().withColumnRenamed("count", "n").collect()}
    print(f"clustered synthetic: n={n2}, true clusters {len(truth)} "
          f"(sizes {sorted(truth.values(), reverse=True)}), policy k={k2}")
    v2 = syn.select("vec_id", "qe")
    cents2, assigned2 = kmeans_fit(v2, iters=1, k=k2, assign="join")
    report("first-K + 1 Lloyd (production)", v2, assigned2, k2)
    report("first-K + 2 Lloyd", v2, lloyd(v2, cents2, 1), k2)
    report("first-K + 4 Lloyd", v2, lloyd(v2, cents2, 3), k2)
    s2 = stride_init(v2, k2)
    report("stride init + 1 Lloyd", v2, lloyd(v2, s2, 1), k2)
    report("stride init + 2 Lloyd", v2, lloyd(v2, s2, 2), k2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
