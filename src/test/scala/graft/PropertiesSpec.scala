package graft

import graft.sizing.{Bucketing, Concurrency}
import graft.plans.PrefixSum
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.2) using raw scalacheck
  * generators over fixed seeds (no scalatest bridge in the offline
  * dependency set): bucketing totality/monotonicity, prefix-scan vs
  * sequential fold, sweep-line vs brute-force interval overlap.
  */
class PropertiesSpec extends SparkTestBase {

  /** Deterministic samples of `gen`, one per seed. */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val labels = Seq("XSMALL", "SMALL", "MEDIUM", "LARGE", "CUSTOM")

  test("bucketing is total and monotone over arbitrary pod counts") {
    import spark.implicits._
    samples(Gen.listOfN(60, Gen.chooseNum(0L, 100000L)), 6).foreach { pods =>
      val got = pods.toDF("p")
        .select(col("p"), Bucketing.tsize(col("p")).as("t"))
        .collect().map(r => r.getLong(0) -> r.getString(1))
      // total: every value gets a label
      assert(got.forall { case (_, t) => labels.contains(t) })
      // monotone: label index never decreases as pods increase
      val sorted = got.sortBy(_._1).map { case (_, t) => labels.indexOf(t) }
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a <= b })
    }
  }

  test("prefix scan equals sequential fold on arbitrary deltas") {
    import spark.implicits._
    val gen = Gen.listOfN(120,
      Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(-9L, 9L)))
    samples(gen, 6).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((ts, d), i) => (ts, i.toLong, d) }
        .toDF("ts", "id", "delta").repartition(3)
      val got = PrefixSum
        .scan(df, "ts", Seq(col("ts"), col("id")), Seq("delta" -> "run"))
        .select("ts", "id", "run").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      var acc = 0L
      val want = rows.zipWithIndex
        .map { case ((ts, d), i) => (ts, i.toLong, d) }
        .sortBy(t => (t._1, t._2))
        .map { case (ts, id, d) => acc += d; (ts, id, acc) }
      assert(got.toSeq == want)
    }
  }

  test("sweep-line max concurrency equals brute force on arbitrary intervals") {
    import spark.implicits._
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0L, 200L), Gen.chooseNum(1L, 80L),
        Gen.chooseNum(1L, 5L)))
    samples(gen, 6).foreach { qs =>
      val ivals = qs.zipWithIndex.map { case ((s, len, pods), i) =>
        (f"q$i%03d", s, s + len, pods)
      }
      val df = ivals
        .toDF("query_id", "admitted_us", "end_us", "min_executor_pod")
        .withColumn("cache_b_per_backend", lit(1L))
        .withColumn("mem_b_per_backend", lit(1L))
        .withColumn("cpu_mv_per_backend", lit(1L))
        .withColumn("spill_b_per_backend", lit(1L))
      val m = Concurrency.maxima(Concurrency.sweep(df)).head
      val brute = ivals.map { case (_, t, _, _) =>
        ivals.filter { case (_, s, e, _) => s <= t && t < e }
          .map(_._4).sum
      }.max
      assert(m.getAs[Long]("max_concurrent_pods") == brute)
    }
  }
}
