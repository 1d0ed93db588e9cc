"""Graph operators: connected components over near-duplicate pairs.

A dedup pipeline's last stage turns pairwise matches into CLUSTERS: if
a~b and b~c, all three are one duplicate group even when a~c was never
observed. This transitive closure is a connected-components problem over
the (sparse) pair graph emitted by the LSH stages.

Scale design (the Pregel / large-star-small-star family):
  * The edge set is the OUTPUT of LSH candidate verification — already
    ~linear in corpus size, never O(N²); the blobs/texts are long gone,
    each edge is two int64 ids.
  * Min-label propagation runs as supersteps: each superstep is one
    shuffle of (src -> label) plus one groupBy(dst) MIN — both map-side
    combinable. Convergence in O(log diameter) supersteps; near-dup
    clusters are tiny cliques in practice, so 2-3 supersteps suffice.
  * Convergence is detected with a single scalar aggregate (labels only
    ever decrease, so an unchanged SUM(label) means a fixpoint) — no
    driver-side materialization of the label table.

The reference has no graph surface; this extends its dedup tier the way
a 100 TB training-data pipeline needs (see SURVEY.md north-star
extensions). Oracle: DuckDB ``WITH RECURSIVE`` reachability over the
same MinHash pairs (operators/dedup.py `_minhash_pair_ctes`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from columnar_estimator_sample_spark.operators.dedup import (
    _minhash_pair_ctes, q_dedup_minhash_lsh,
)
from columnar_estimator_sample_spark.registry import register

MAX_SUPERSTEPS = 25  # >= log2(diameter) for any plausible dup graph


def connected_components(pairs: DataFrame,
                         src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Min-label propagation over an undirected pair list.

    Returns (doc_id, cluster_id) for every node that appears in ``pairs``,
    where cluster_id = min(doc_id) of the node's component.

    Each superstep: neighbor-min via join(edges, labels) + groupBy MIN,
    then element-wise least() with the current label. The driver loop only
    ever pulls ONE scalar per superstep (the label-sum convergence probe);
    labels/edges stay distributed and cached.
    """
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionAll(pairs.select(F.col(dst).alias("src"),
                               F.col(src).alias("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(MAX_SUPERSTEPS):
        nbr_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.dst, "left")
            .select(
                "doc_id",
                F.least(F.col("label"),
                        F.coalesce(F.col("nbr_min"), F.col("label")))
                .alias("label"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:  # labels only decrease: fixpoint reached
            break
        prev_sum = new_sum
    edges.unpersist()
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def _clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE {_minhash_pair_ctes()},
    edges AS MATERIALIZED (
        -- MATERIALIZED: DuckDB inlines plain CTEs, which would re-run the
        -- whole MinHash pipeline on every recursive iteration (~100x).
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(doc_id, label) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.label
        FROM reach r JOIN edges e ON e.src = r.doc_id
    ),
    comp AS (
        SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id
    )
    SELECT cluster_id, doc_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM comp
    ORDER BY cluster_id, doc_id
    """


@register("q_dedup_clusters", oracle=_clusters_oracle())
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the verified
    MinHash-LSH near-dup pairs (transitive closure of a~b). Returns every
    clustered document with its cluster id (= min doc_id in the
    component, the retention survivor) and the cluster size.

    Scale: edges are the LSH output (~linear in corpus); label
    propagation converges in O(log diameter) supersteps of two narrow
    shuffles each; the final window shares the cluster_id partitioning.
    """
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    w = Window.partitionBy("cluster_id")
    return (
        comp.select("cluster_id", "doc_id")
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .orderBy("cluster_id", "doc_id")
    )
