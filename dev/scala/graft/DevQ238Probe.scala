package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: q238 pair-scan plan + timing evidence (OPTIMIZATION_r17).
  * Prints the formatted plan and timing of the OLD pair-scan form
  * (transform(sequence, i -> element_at(tk, i))) next to the SHIPPED
  * zip_with form, so the CollapseProject-inlines-the-regex-per-element
  * claim is reproducible.
  */
object DevQ238Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val tk = docs.select(
      expr("regexp_extract_all(lower(`text`), '[a-z]+', 0)").as("tk"))

    val oldForm = tk
      .select(expr("CASE WHEN size(tk) >= 2 THEN transform(" +
        "sequence(1, size(tk) - 1), i -> named_struct(" +
        "'a', element_at(tk, i), 'b', element_at(tk, i + 1))) " +
        "ELSE array() END").as("ps"))
      .select(explode(col("ps")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))
    val newForm = tk
      .select(explode(expr(
        "zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)), " +
        "slice(tk, 2, greatest(size(tk) - 1, 0)), " +
        "(x, y) -> named_struct('a', x, 'b', y))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))

    println("==== q238 pair scan, OLD form (element_at lambda) ====")
    oldForm.explain("formatted")
    println("==== q238 pair scan, SHIPPED form (zip_with slices) ====")
    newForm.explain("formatted")

    oldForm.count(); newForm.count() // warm
    time("old pair scan")(oldForm.count())
    time("new pair scan")(newForm.count())
    spark.stop()
  }
}
