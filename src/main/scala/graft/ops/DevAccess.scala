package graft.ops

import org.apache.spark.sql.DataFrame

/** Dev-probe access shims for private[ops] helpers (dev/scala mains live
  * outside the ops package). No product code path uses this. */
object DevQ199Access {
  def grams(docs: DataFrame, textCol: String, k: Int): DataFrame =
    Dedup.positionalGrams(docs, textCol, k)
}
