package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Modularity of LPA labels on the bipartite trade graph vs its
  * supplier co-purchase projection — picks the q218 shape.
  */
object DevQ218Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cs = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey")
      .join(Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey", "l_suppkey").agg(count(lit(1)).as("nl"))
      .filter(col("nl") >= 2)
    val proj = cs.as("x").join(cs.as("y"),
        col("x.o_custkey") === col("y.o_custkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
      .groupBy(col("x.l_suppkey").as("a0"), col("y.l_suppkey").as("b0"))
      .agg(count(lit(1)).as("w"))
      .select(col("a0").cast("bigint").as("a"),
        col("b0").cast("bigint").as("b"), col("w"))
    println("Q218PROBE proj_edges=" + proj.count())
    val labels = ops.Graph.labelPropagation(proj, 4)
    println("Q218PROBE n_labels=" +
      labels.select("lbl").distinct().count())
    ops.Graph.modularityMicro(proj, labels).collect()
      .foreach(r => println("Q218PROBE projected " + r))
    spark.stop()
  }
}
