"""One cold measurement of minhash_verified_pairs at 10x distinct,
mirroring bench_llmops_scaling's corpus + measurement exactly.
Prints one JSON line. Interleave runs with different dedup.py
versions to A/B a code change under identical host conditions.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from pids_drg_esoa_spark.operators.dedup import minhash_verified_pairs
    from pids_drg_esoa_spark.session import get_spark
    from pids_drg_esoa_spark.sources.tables import table

    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="ab-minhash", ui=False)
    base = table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    n_base = base.count()
    # stride from max(doc_id)+1, not 10*n_base (r13 ADVICE #2: sparse
    # ids would collide across copies and plant phantom duplicates)
    stride = base.agg(F.max("doc_id")).first()[0] + 1
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    tag = F.concat(F.lit("_c"), F.col("copy").cast("string"))
    docs = (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * stride).alias("doc_id"),
            F.array_join(
                F.transform(F.split("text", " "), lambda w: F.concat(w, tag)), " "
            ).alias("text"),
        )
        .persist()
    )
    n_docs = docs.count()
    walls = []
    for _ in range(4):
        t0 = time.time()
        v, caches = minhash_verified_pairs(docs, n_docs=n_docs)
        n_pairs = v.count()
        walls.append(round(time.time() - t0, 2))
        for r in caches:
            r.unpersist()
    print(json.dumps({"mult": mult, "n_docs": n_docs, "walls": walls,
                      "min": min(walls), "n_pairs": n_pairs}))
    spark.stop()


if __name__ == "__main__":
    main()
