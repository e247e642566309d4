package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster-
  * resolution step of a near-dup dedup pipeline (SURVEY §2.9): LSH/SimHash
  * candidate generation yields PAIRS; turning pairs into duplicate
  * GROUPS ("keep one doc per component") is a connected-components
  * problem over the pair graph.
  *
  * Algorithm: min-label propagation with pointer jumping, expressed
  * entirely as DataFrame joins/aggregations —
  *
  *   1. every vertex starts labeled with its own id;
  *   2. each round, every vertex adopts the minimum over three candidate
  *      sets fused into ONE aggregate: its own label, its neighbors'
  *      labels (edges⋈labels), and its representative's label
  *      (labels⋈labels — the pointer-jumping step). The jump roughly
  *      doubles label reach per round, so convergence is O(log diameter)
  *      rounds at the same two-jobs-per-round cost as plain propagation;
  *   3. stop when a round changes no label.
  *
  * Every round is a pair of key-partitioned joins + a partial aggregate —
  * no driver-side data, no full-graph collect — and each round's result
  * is localCheckpoint()ed so lineage stays O(1) instead of growing per
  * iteration (superseded checkpoint blocks are released by Spark's
  * ContextCleaner once the superseded round's RDD is unreferenced).
  *
  * Determinism: labels are ids, min is associative/commutative, and the
  * fixpoint (min id reachable) is unique — results are independent of
  * partitioning and iteration interleaving.
  */
object Graph {

  /** @param edges undirected edges as columns `a`, `b` (self-loops and
    *              duplicates tolerated; null endpoints dropped); vertex
    *              type must be orderable.
    * @return one row per distinct non-null endpoint: (`id`, `comp`) with
    *         `comp` = the minimum vertex id reachable from `id`
    *         (component representative).
    * @throws IllegalStateException if labels have not converged after
    *         `maxIter` rounds (2^maxIter ≥ diameter is ample for any
    *         real graph at the default) — a silent early stop would
    *         report one component as several.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val pairs = edges.select(col("a"), col("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    // Vertex set BEFORE dropping self-loops: a vertex whose only edge is
    // (v, v) is still a (singleton) component and must appear in the
    // output.
    val verts = pairs
      .select(explode(array(col("a"), col("b"))).as("id")).distinct()
    // Symmetrized edge set; read by every propagation round.
    val und = pairs.filter(col("a") =!= col("b"))
    val sym = und
      .union(und.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist()

    var labels = verts.select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // neighbor labels: for edge (a,b), a's current label is a candidate
      // for b (symmetry already materialized in `sym`)
      val msgs = sym
        .join(labels.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), col("comp"))
      // pointer jump, fused into the same round: the representative's
      // representative is one more candidate label (a |V|-row self-join
      // on the checkpointed frame, skewed toward converged comp values —
      // but fused here it rides the round's existing shuffle instead of
      // needing its own materialization pass). Labels are always vertex
      // ids with comp(x) <= x, so the inner join matches every row and
      // labels stay monotone non-increasing.
      val jump = labels
        .join(labels.select(col("id").as("comp"), col("comp").as("jump")),
          "comp")
        .select(col("id"), col("jump").as("comp"))
      // The round's previous label rides the same aggregate (min over the
      // own-row only), so convergence needs no labels⋈next join; and the
      // checkpoint is marked LAZY so the changed-count below is the ONE
      // action per round — it materializes the checkpoint blocks and
      // returns the count in the same job.
      val next = labels.withColumn("own", lit(true))
        .unionByName(msgs.withColumn("own", lit(false)))
        .unionByName(jump.withColumn("own", lit(false)))
        .groupBy("id").agg(
          min(col("comp")).as("comp"),
          min(when(col("own"), col("comp"))).as("prev"))
        .localCheckpoint(false)
      changed = next.filter(col("comp") =!= col("prev")).count()
      labels = next.select(col("id"), col("comp"))
      iter += 1
    }
    sym.unpersist()
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing) — raise maxIter")
    labels
  }
}
