package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Plan-level proof that bucketed tables co-locate joins and aggregations:
  * the same join over plain parquet shuffles both sides; over bucketed
  * tables it must plan with zero Exchange operators.
  */
class BucketedTablesSpec extends SparkTestBase {

  private val Buckets = 4

  private def fixture() = {
    import spark.implicits._
    val orders = (1L to 400L).map(i => (i, s"prio${i % 3}")).toDF("k", "prio")
    val items = (1L to 1200L).map(i => (i % 400 + 1, i * 1.5)).toDF("k", "amt")
    BucketedTables.writeBucketed(orders, "graft_b_orders", "k", Buckets)
    BucketedTables.writeBucketed(items, "graft_b_items", "k", Buckets)
  }

  test("bucketed equi-join plans with zero shuffle exchanges") {
    fixture()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.colocatedJoin(spark,
        "graft_b_orders", "graft_b_items", "k")
      assert(joined.count() == 1200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)

      // control: the same data joined as plain DataFrames DOES shuffle
      val l = spark.table("graft_b_orders").filter(lit(true))
      val control = l.as("a").join(
        spark.read.parquet(spark.conf.get("spark.sql.warehouse.dir")
          + "/graft_bucketed/graft_b_items").as("b"), "k")
      assert(control.count() == 1200)
      assert(control.queryExecution.executedPlan.toString
        .contains("Exchange"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("aggregation on the bucket key needs no exchange") {
    fixture()
    val agg = spark.table("graft_b_items").groupBy("k")
      .agg(sum(col("amt")).as("total"))
    assert(agg.count() == 400)
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
