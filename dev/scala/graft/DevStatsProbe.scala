package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: does localCheckpoint carry blown-up join stats? Print the
  * bit length of sizeInBytes per self-join round. */
object DevStatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    var df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "comp")
      .localCheckpoint(true)
    for (k <- 1 to 8) {
      val t0 = System.nanoTime()
      val joined = df
        .join(df.select(col("id").as("comp"), col("comp").as("jump")), "comp")
        .select(col("id"), col("jump").as("comp"))
      val ck = joined.localCheckpoint(true)
      val bits =
        ck.queryExecution.optimizedPlan.stats.sizeInBytes.bigInteger.bitLength
      val jbits = joined.queryExecution.optimizedPlan.stats.sizeInBytes
        .bigInteger.bitLength
      println(f"round $k: join stats bits=$jbits ckpt stats bits=$bits " +
        f"build ${(System.nanoTime() - t0) / 1e9}%.2f s")
      df = ck
    }
    spark.stop()
  }
}
