package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: physical-plan evidence for the round-18 iterative-round
  * aggregate fusion (labelPropagation / louvainMoves shape).
  *
  * SHIPPED change: an explicit `repartition(a)` between the per-round
  * join and the two-level aggregate — hash(a) satisfies the (a, lbl)
  * clustering, so BOTH aggregate levels run partition-local: the two
  * aggregate Exchanges per round collapse into one AQE-coalescible
  * exchange (plans A vs B below).
  *
  * REJECTED variant (kept here as the measured negative result): caching
  * the edge frame hash(join-key)-pre-partitioned removes the per-round
  * sym-side Exchange too (plan C: the SMJ reads InMemoryTableScan with
  * no Exchange above it) — but the pinned partitioning disables AQE
  * coalescing along the whole round path and cost 15–30% on every
  * CC/LPA consumer at sf0.1 (q50 2.4→2.9 s, q209 3.2→3.8 s, q211
  * 1.75→2.3 s). localCheckpoint cannot replace the cache: under AQE it
  * reports UnknownPartitioning (plan A's sym scan).
  */
object DevLpaPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // emulate the at-scale join strategy: the question this probe
      // answers is how the SMJ round plan is shaped, not broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val und = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey")
      .join(Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey", "l_suppkey").agg(count(lit(1)).as("nl"))
      .filter(col("nl") >= 2)
      .select((-col("o_custkey")).cast("bigint").as("a"),
        col("l_suppkey").cast("bigint").as("b"), col("nl").as("w"))

    def round(sym: DataFrame, labels: DataFrame,
        fused: Boolean): DataFrame = {
      val joined = sym
        .join(labels.select(col("id").as("b"), col("lbl")), "b")
      val pre = if (fused) joined.repartition(col("a")) else joined
      pre
        .groupBy("a", "lbl").agg(sum(col("w")).as("ws"))
        .groupBy("a")
        .agg(min(struct((-col("ws")).as("nws"), col("lbl"))).as("m"))
        .select(col("a").as("id"), col("m.lbl").as("lbl"))
    }

    val sym = und
      .union(und.select(col("b").as("a"), col("a").as("b"), col("w")))
      .groupBy("a", "b").agg(sum(col("w")).as("w"))
      .ckptLocal(eager = true)
    val labels = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .ckptLocal(eager = true)

    println("==== A: LPA round, r17 shape (two aggregate exchanges) ====")
    round(sym, labels, fused = false).explain("formatted")
    println("==== B: LPA round, r18 shape (repartition(a), one exchange) ====")
    round(sym, labels, fused = true).explain("formatted")

    // C: rejected cached pre-partitioned edge frame (see scaladoc)
    val symCached = und
      .union(und.select(col("b").as("a"), col("a").as("b"), col("w")))
      .repartition(col("b"))
      .groupBy("a", "b").agg(sum(col("w")).as("w"))
      .persist()
    symCached.count()
    println("==== C: REJECTED cached hash(b) edge frame ====")
    round(symCached, labels, fused = true).explain("formatted")
    spark.stop()
  }
}
