"""Connected components — cluster assignment over near-duplicate pairs.

The canonical post-dedup step: near-dup PAIRS (from LSH/Jaccard) must
become CLUSTERS (keep one doc per component). This is an iterative
algorithm Spark has no builtin for (GraphFrames isn't on the
classpath): implemented as minimum-label propagation — every node
repeatedly adopts the smallest label among itself and its neighbors
until a fixpoint. Convergence needs <= graph-diameter rounds; each
round is one join + one aggregate, all JVM-side; the driver only
checks the (scalar) changed-count per round. Near-dup graphs are
shallow (diameter is small), so rounds stay in single digits at any
corpus size; hot components behave like any skewed agg key (AQE/salt).

Oracle: a DuckDB recursive CTE computing min reachable id per node —
an independent formulation of the same fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from porcupine_spark.operators.dedup import SQL_HOT_DF_CUTOFF, SQL_SHINGLES
from porcupine_spark.plans.registry import query

MAX_ROUNDS = 50  # backstop far above any real near-dup graph diameter

# Near-dup edge lists are the OUTPUT of LSH/threshold pruning, orders of
# magnitude smaller than the corpus: even a 100 TB corpus rarely yields
# more than a few million surviving pairs. Below this count a single
# driver-side union-find pass (exact, O(E α(E))) beats any number of
# distributed rounds — each round costs a join + agg + action of fixed
# overhead. Above it, the label-propagation loop takes over unchanged.
UNION_FIND_MAX_EDGES = 2_000_000


def _union_find_components(edges: DataFrame) -> DataFrame:
    """Exact driver-side components for small edge sets (two bigint cols
    ``s``/``d``): collect, union-find with path halving, re-distribute."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    # collect(), not toLocalIterator(): one round-trip instead of one
    # per partition (this path is only taken when edges are small)
    for row in edges.collect():
        a, b = row.s, row.d
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # component id = min member id (same contract as the distributed path)
    root_min: dict[int, int] = {}
    for node in parent:
        r = find(node)
        if r not in root_min or node < root_min[r]:
            root_min[r] = node
    import pandas as pd

    pdf = pd.DataFrame(
        ((node, root_min[find(node)]) for node in parent), columns=["node", "component"]
    )
    spark = edges.sparkSession
    t = edges.schema["s"].dataType.simpleString()
    # Arrow path (pandas in, explicit schema) — the tuple-list path costs
    # seconds in per-row pickling + 32-task parallelize for tiny data
    return spark.createDataFrame(pdf, schema=f"node {t}, component {t}")


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(src, dst) undirected edges -> (node, component) where component
    is the minimum node id in the connected component."""
    # materialize the (possibly expensive) edge lineage ONCE — the loop
    # below joins against sym every round and must not recompute it
    edges = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).localCheckpoint(eager=True)
    # size the loop's partitioning to the GRAPH, not the session: the
    # label frontier is usually orders of magnitude smaller than the
    # corpus, and per-round fixed cost scales with partition count
    n_edges = edges.count()
    if n_edges <= UNION_FIND_MAX_EDGES:
        return _union_find_components(edges)
    n_parts = max(2, min(32, n_edges // 50_000 + 2))
    nodes = (
        edges.select(F.col("s").alias("node"))
        .unionByName(edges.select(F.col("d").alias("node")))
        .distinct()
    )
    sym = (
        edges.select(F.col("s").alias("a"), F.col("d").alias("b"))
        .unionByName(edges.select(F.col("d").alias("a"), F.col("s").alias("b")))
        .distinct()
        .repartition(n_parts, "b")
        .localCheckpoint(eager=True)
    )
    labels = nodes.repartition(n_parts, "node").withColumn("component", F.col("node"))
    for _ in range(MAX_ROUNDS):
        # each node adopts min(own label, neighbors' labels)
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        # NOTE: a pointer-jumping variant (follow component-of-component,
        # O(log d) rounds) was measured SLOWER here — near-dup graphs
        # have tiny diameters, so the extra join per round costs more
        # than the rounds it saves. Revisit only for deep graphs.
        # checkpoint FIRST (one materialization of the round's join), then
        # derive both the convergence scalar and the next labels from the
        # checkpointed rows — computing `changed` off the raw plan and
        # checkpointing afterwards would execute the join twice per round
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("nmin", F.col("component"))).alias(
                    "new_component"
                ),
                "component",
            )
            .localCheckpoint(eager=True)
        )
        # one scalar to the driver per round: the convergence check
        changed = updated.filter(F.col("new_component") != F.col("component")).count()
        labels = updated.select("node", F.col("new_component").alias("component"))
        if changed == 0:
            break
    return labels


@query(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {SQL_SHINGLES},
    df AS (SELECT shingle, COUNT(*) AS c FROM shingles GROUP BY shingle),
    keep AS (
      SELECT s.doc_id, s.shingle FROM shingles s JOIN df USING (shingle)
      WHERE c <= {SQL_HOT_DF_CUTOFF}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM keep GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM keep a JOIN keep b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.05
    ),
    sym AS (
      SELECT src AS a, dst AS b FROM edges
      UNION SELECT dst, src FROM edges
    ),
    reach AS (
      SELECT a AS node, a AS r FROM sym
      UNION SELECT a, b FROM sym
      UNION
      SELECT reach.node, sym.b
      FROM reach JOIN sym ON sym.a = reach.r
    )
    SELECT node, MIN(r) AS component FROM reach GROUP BY node
    """,
    tags=("dedup", "graph", "iterative"),
    doc="Near-dup cluster assignment: word-3-gram Jaccard>=0.05 pairs "
    "as edges, connected components via min-label propagation "
    "(iterative joins, lineage-checkpointed, converges in <=diameter "
    "rounds). Oracle = recursive-CTE transitive closure, an "
    "independent fixpoint formulation.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the edge list IS dedup_ngram_jaccard's output (already thresholded
    # at 0.05) — one implementation of the inverted-index join to keep
    # fast, not two
    from porcupine_spark.operators.dedup import dedup_ngram_jaccard

    edges = dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return connected_components(edges).select("node", "component")


@query(
    "dup_cluster_size_histogram",
    None,  # late-bound: composes dedup_clusters' recursive oracle
    tags=("dedup", "graph", "monitoring"),
    doc="Distribution of near-dup cluster sizes - the dedup-health "
    "report (a sudden spike in giant clusters means boilerplate or a "
    "crawler loop, not ordinary duplication). Composes dedup_clusters "
    "verbatim (builder AND oracle), groups nodes per component, then "
    "counts components per size: |distinct sizes| output rows, two "
    "narrowing aggregations past the clustering itself. The REGISTERED "
    "query measures the from-scratch (same-job) mode so its oracle "
    "composition can't drift; at 100 TB the report reads a "
    "MATERIALIZED cluster artifact instead of reclustering - "
    "cluster_size_histogram_from(spark.read.parquet(clusters_path)), "
    "pytest-pinned equal to this from-scratch result.",
)
def dup_cluster_size_histogram(spark, sf_dir):
    return cluster_size_histogram_from(dedup_clusters(spark, sf_dir))


def cluster_size_histogram_from(clusters):
    """The histogram body over a ``(node, component)`` assignment — the
    artifact path: feed it the MATERIALIZED clusters parquet (the
    examples/example_incremental.py pattern) so a 100 TB health report
    is two narrowing aggregations, not a reclustering."""
    from pyspark.sql import functions as F

    sizes = clusters.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(F.count(F.lit(1)).alias("n_clusters"))


from porcupine_spark.plans.registry import REGISTRY as _REG  # noqa: E402

_REG["dup_cluster_size_histogram"].oracle = f"""
    WITH sizes AS (
      SELECT component, COUNT(*) AS cluster_size
      FROM ({_REG["dedup_clusters"].oracle}) c
      GROUP BY component
    )
    SELECT cluster_size, COUNT(*) AS n_clusters
    FROM sizes GROUP BY cluster_size
"""
