package graft.plans

import graft.SparkTestBase
import graft.CkptLocalOps
import org.apache.spark.sql.GraftPlanStats
import org.apache.spark.sql.functions._

/** Pins [[org.apache.spark.sql.GraftPlanStats.clampedLocalCheckpoint]]
  * (`ckptLocal`), the library-wide localCheckpoint replacement:
  *
  *  1. sane statistics pass through UNCHANGED (plan decisions cannot
  *     differ from stock localCheckpoint in the regime where magnitude
  *     matters);
  *  2. the checkpointed-self-join loop that doubles the stats BigInt's
  *     bit length per round under stock localCheckpoint (the driver-
  *     side BigInteger.multiply planning stall measured on q209's
  *     connected components) stays inside the 64-bit regime under
  *     ckptLocal;
  *  3. values are identical to the stock path round for round.
  */
class CkptStatsSpec extends SparkTestBase {

  import spark.implicits._

  private def chain(df: org.apache.spark.sql.DataFrame, rounds: Int,
      clamped: Boolean): org.apache.spark.sql.DataFrame = {
    var cur = if (clamped) df.ckptLocal(true) else df.localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val joined = cur
        .join(cur.select(col("id").as("comp"), col("comp").as("jump")),
          "comp")
        .select(col("id"), col("jump").as("comp"))
      cur = if (clamped) joined.ckptLocal(true)
        else joined.localCheckpoint(true)
    }
    cur
  }

  test("sane stats pass through unchanged") {
    val df = (1L to 50L).map(i => (i, i)).toDF("id", "comp")
    val stock = GraftPlanStats.planStats(df.localCheckpoint(true))
    val ours = GraftPlanStats.planStats(df.ckptLocal(true))
    assert(stock.sizeInBytes <= BigInt(Long.MaxValue),
      "fixture must start in the sane regime")
    assert(ours.sizeInBytes === stock.sizeInBytes)
    assert(ours.rowCount === stock.rowCount)
  }

  test("self-join round stats stay in the 64-bit regime (stock explodes)") {
    val df = (1L to 50L).map(i => (i, i)).toDF("id", "comp")
    val stockBits = GraftPlanStats
      .planStats(chain(df, 6, clamped = false)).sizeInBytes
      .bigInteger.bitLength
    val oursBits = GraftPlanStats
      .planStats(chain(df, 6, clamped = true)).sizeInBytes
      .bigInteger.bitLength
    // the hazard this spec exists for: stock localCheckpoint carries
    // the squared-per-round estimate through the checkpoint
    assert(stockBits > 64,
      s"stock stats unexpectedly sane ($stockBits bits) — did Spark " +
        "stop carrying originStats through localCheckpoint?")
    assert(oursBits <= 64, s"clamped stats escaped the long regime " +
      s"($oursBits bits)")
  }

  test("values identical to the stock checkpoint path") {
    // id -> parent chain: compression fixpoint is id -> 1 for all
    val df = (2L to 40L).map(i => (i, i - 1)).toDF("id", "comp")
      .union(Seq((1L, 1L)).toDF("id", "comp"))
    val a = chain(df, 6, clamped = false).orderBy("id").collect().toSeq
    val b = chain(df, 6, clamped = true).orderBy("id").collect().toSeq
    assert(a === b)
  }
}
