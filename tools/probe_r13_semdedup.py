"""Round-13 probe: where does semantic_dedup's wall time go?

Decomposes the query into (a) the MLlib KMeans fit (model-defining —
untouchable: cluster ids and centroid_sim are declared output columns),
(b) the assignment + checkpoint leg, (c) the pair/CC/decision tail.
Min-of-reps through the noop sink, quiet host.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stock_market_etl_pipeline_spark.session import get_spark  # noqa: E402
from stock_market_etl_pipeline_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = 3


def timeit(label, fn):
    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:42s} min {best:7.3f} s")
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("probe-semdedup")
    spark.sparkContext.setLogLevel("ERROR")

    emb_raw = load_table(spark, SF_DIR, "embeddings")
    from stock_market_etl_pipeline_spark.operators.similarity import (
        ivf_assignments,
        semantic_dedup,
    )

    # warm-up (JIT, footers)
    noop(semantic_dedup(emb_raw, n_clusters=16, threshold=0.35))

    spark.sparkContext.setJobDescription("semdedup: full query")
    timeit("full semantic_dedup", lambda: noop(
        semantic_dedup(emb_raw, n_clusters=16, threshold=0.35)))

    spark.sparkContext.setJobDescription("semdedup: fit only")
    timeit("KMeans fit only (ivf_assignments.fit)", lambda: ivf_assignments(
        emb_raw, n_clusters=16, seed=42))

    spark.sparkContext.setJobDescription("semdedup: fit+assign noop")
    def assign_leg():
        assigned, _ = ivf_assignments(emb_raw, n_clusters=16, seed=42)
        noop(assigned)
    timeit("fit + assignment materialized", assign_leg)

    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__" and os.environ.get("LEGS") != "1":
    main()


def legs():
    spark = get_spark("probe-semdedup-legs")
    spark.sparkContext.setLogLevel("ERROR")
    emb_raw = load_table(spark, SF_DIR, "embeddings")
    from stock_market_etl_pipeline_spark.operators.dedup import bucket_pairs
    from stock_market_etl_pipeline_spark.operators.graph import (
        connected_components,
    )
    from stock_market_etl_pipeline_spark.operators.similarity import (
        _to_double,
        cosine,
        ivf_assignments,
    )

    # one shared prefix per rep, timed leg by leg
    def build_emb():
        assigned, model = ivf_assignments(emb_raw, n_clusters=16, seed=42)
        centroids = spark.createDataFrame(
            [(int(i), [float(x) for x in c])
             for i, c in enumerate(model.clusterCenters())],
            "cluster int, centroid array<double>",
        )
        return (
            emb_raw.join(assigned, "vec_id")
            .join(F.broadcast(centroids), "cluster")
            .select(
                "vec_id", "cluster",
                _to_double(F.col("embedding")).alias("v"),
                F.round(cosine(_to_double(F.col("embedding")),
                               F.col("centroid")), 6).alias("centroid_sim"),
            )
            .localCheckpoint(eager=True)
        )

    # warm-up
    emb = build_emb()

    t0 = time.perf_counter()
    emb = build_emb()
    print(f"emb build (fit+assign+join+ckpt)   {time.perf_counter()-t0:7.3f} s")

    t0 = time.perf_counter()
    cand = bucket_pairs(
        emb.select("cluster", "vec_id"), ["cluster"], id_col="vec_id",
        out=("id_a", "id_b"), max_bucket=4096,
    )
    va = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    vb = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    dup_edges = (
        cand.join(va, "id_a").join(vb, "id_b")
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= 0.35)
        .select("id_a", "id_b")
    )
    noop(dup_edges)
    print(f"pair phase (bucket+2 joins+filter) {time.perf_counter()-t0:7.3f} s")

    t0 = time.perf_counter()
    comp = connected_components(dup_edges, src="id_a", dst="id_b")
    noop(comp)
    print(f"connected_components               {time.perf_counter()-t0:7.3f} s")
    print("edges:", dup_edges.count(), "comp nodes:", comp.count())


if __name__ == "__main__" and os.environ.get("LEGS") == "1":
    legs()
