package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster-
  * resolution step of a near-dup dedup pipeline (SURVEY §2.9): LSH/SimHash
  * candidate generation yields PAIRS; turning pairs into duplicate
  * GROUPS ("keep one doc per component") is a connected-components
  * problem over the pair graph.
  *
  * Algorithm: iterative min-label propagation, expressed entirely as
  * DataFrame joins/aggregations —
  *
  *   1. every vertex starts labeled with its own id;
  *   2. each round, every vertex adopts the minimum label in its closed
  *      neighborhood (its own ∪ its neighbors' labels) via an
  *      edges⋈labels join + min-aggregate;
  *   3. stop when a round changes no label (or `maxIter` caps it).
  *
  * Rounds = graph diameter. For dedup graphs this is the right trade:
  * near-dup clusters are small and dense (diameter ≲ 5), so 3–5
  * bounded-shuffle rounds beat the bookkeeping of the O(log n)
  * large-star/small-star scheme, which pays off only on adversarially
  * long path graphs. Every round is a key-partitioned join + partial
  * aggregate — no driver-side data, no full-graph collect — and each
  * round's result is localCheckpoint()ed so lineage (and thus recovery
  * cost) stays O(1) instead of growing per iteration.
  *
  * Determinism: labels are ids, min is associative/commutative, and the
  * fixpoint (min id reachable) is unique — results are independent of
  * partitioning and iteration interleaving.
  */
object Graph {

  /** @param edges undirected edges as columns `a`, `b` (self-loops and
    *              duplicates tolerated); vertex type must be orderable.
    * @return one row per distinct endpoint: (`id`, `comp`) with `comp` =
    *         the minimum vertex id reachable from `id` (component
    *         representative).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // Symmetrize once; both the vertex set and every propagation round
    // read this, so it is persisted for the loop and released after.
    val und = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()

    var labels = und.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // neighbor labels: for edge (a,b), a's current label is a candidate
      // for b (symmetry already materialized in `und`)
      val msgs = und
        .join(labels.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), col("comp"))
      val next = labels.unionByName(msgs)
        .groupBy("id").agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      changed = next
        .join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev"))
        .count()
      labels = next
      iter += 1
    }
    und.unpersist()
    labels
  }
}
