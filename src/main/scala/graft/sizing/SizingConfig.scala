package graft.sizing

/** Engine configuration — the knobs the reference reads from its
  * `key=value` config file (sizing.conf:1–29, parsed at
  * impala_query_sizing.py:88–117).
  *
  * Quirk stances (SURVEY §2.10):
  *  - Q3: `cacheAdjustmentPct` is accepted but defaults to 100 (the
  *    reference reads it at py:102 and never applies it, py:235);
  *    `scratchAdjustmentPct` likewise (in conf:13, never read).
  *  - Q4: `vcoresLimited` is just `vcoresPerNode` (the per-query
  *    `min(vcores_per_node, avg_vcores)` is commented out at py:228–229).
  *  - Q8: `pool` is optional (the reference NameErrors in API mode when
  *    absent, py:116–117 vs 138).
  */
final case class SizingConfig(
    scratchGbPerNode: Double = 1000, // sizing.conf:15
    cacheGbPerNode: Double = 1000, // sizing.conf:16
    queryMemPerNode: Double = 200, // sizing.conf:17
    vcoresPerNode: Int = 16, // sizing.conf:18
    memAdjustmentPct: Double = 100, // sizing.conf:10
    cpuAdjustmentPct: Double = 80, // sizing.conf:12
    cacheAdjustmentPct: Double = 100, // Q3: read but never applied (py:235)
    scratchAdjustmentPct: Double = 100, // Q3: in conf, never read
    mtDop: Int = 12, // sizing.conf:20
    podLimit: Int = 100, // sizing.conf:24
    pool: Option[String] = None, // sizing.conf:25 (optional; Q8)
    inputFile: Option[String] = None, // sizing.conf:28
    outputFile: String = "sizing_output.csv", // sizing.conf:22
    pruneOutputFile: String = "sizing_pruned.csv", // sizing.conf:23
    skipQueryFile: String = "skipped_queries.txt" // sizing.conf:26
) {

  /** Multithreading scaling factor: `round(0.93^(mt_dop-1) * mt_dop, 2)` —
    * computed once at config time (py:112); mt_dop=12 ⇒ 5.4.
    */
  def mtScalingFactor: Double =
    BigDecimal(math.pow(0.93, mtDop - 1) * mtDop)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Q4 (py:228–230): the commented-out per-query min() means the parallel
    * factor is a config-time constant `max(mtScalingFactor, vcoresPerNode)`.
    */
  def parallelFactor: Double = math.max(mtScalingFactor, vcoresPerNode.toDouble)
}

object SizingConfig {

  /** Parse the reference's flat `key=value` config format (py:88–92):
    * one pair per line, `#` comments and blank lines ignored.
    */
  def fromProperties(text: String): SizingConfig = {
    val kv = text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.take(i).trim -> l.drop(i + 1).trim
      }
      .toMap
    def d(k: String, dflt: Double) = kv.get(k).map(_.toDouble).getOrElse(dflt)
    def i(k: String, dflt: Int) = kv.get(k).map(_.toInt).getOrElse(dflt)
    SizingConfig(
      scratchGbPerNode = d("scratch_gb_per_node", 1000),
      cacheGbPerNode = d("cache_gb_per_node", 1000),
      queryMemPerNode = d("query_mem_per_node", 200),
      vcoresPerNode = i("vcores_per_node", 16),
      memAdjustmentPct = d("mem_adjustment_pct", 100),
      cpuAdjustmentPct = d("cpu_adjustment_pct", 80),
      cacheAdjustmentPct = d("cache_adjustment_pct", 100),
      scratchAdjustmentPct = d("scratch_adjustment_pct", 100),
      mtDop = i("mt_dop", 12),
      podLimit = i("pod_limit", 100),
      pool = kv.get("pool").filter(_.nonEmpty),
      inputFile = kv.get("input_file").filter(_.nonEmpty),
      outputFile = kv.getOrElse("output_file", "sizing_output.csv"),
      pruneOutputFile = kv.getOrElse("prune_output_file", "sizing_pruned.csv"),
      skipQueryFile = kv.getOrElse("skip_query_file", "skipped_queries.txt")
    )
  }
}
