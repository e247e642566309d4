package graft.ops

import graft.CkptLocalOps
import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interchange-format round trips (SURVEY §2 sources/sinks, widened).
  *
  * The sizing pipeline already proves CSV write→read under the oracle
  * (q101); this module does the same for JSON-lines — the other
  * interchange format a data-engineering stack must round-trip
  * losslessly (API dumps, event logs, curation manifests are JSONL
  * before they are parquet).
  */
object Formats extends QueryModule {

  // --- q112: JSONL sink → source round trip under the table checksum ------
  // documents → .json() (one JSONL file per partition) → schema-pinned
  // read-back → grouped XOR content checksum (q93's operator — ONE drift
  // surface for "did every byte survive"). The checksum covers every
  // column including the free-text body, so a single lost escape, mangled
  // codepoint, or dropped row flips it; the oracle computes the identical
  // checksum straight from the parquet table, so the parity proven is
  // parquet == JSONL-round-tripped content. Scale shape: the write and
  // read are both partition-parallel (JSONL splits by line); the checksum
  // is one grouped aggregate.
  private val docRowKeySpark =
    "concat_ws('|', CAST(doc_id AS STRING), text, " +
      "coalesce(lang, '<N>'), CAST(n_chars AS STRING))"

  /** Scratch root for sink→source round trips. Honors
    * `spark.graft.scratch.dir` (any Hadoop-FS URI — set it to a SHARED
    * filesystem on a multi-node cluster, where a driver-local /tmp would
    * silently lose every executor-written partition); unset, falls back
    * to a driver-local temp dir, which is correct only in local mode
    * (the harness's `local[32]`). Cleanup goes through the Hadoop
    * FileSystem API so both schemes delete the same way.
    */
  private def withScratch[A](s: SparkSession, tag: String)(
      body: String => A): A = {
    val base = s.conf.getOption("spark.graft.scratch.dir").getOrElse(
      java.nio.file.Files.createTempDirectory(s"graft-$tag-").toUri.toString)
    val path = new org.apache.hadoop.fs.Path(
      s"$base/${tag}-${java.util.UUID.randomUUID()}")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    try body(path.toString)
    finally fs.delete(path, true)
  }

  private def q112(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    withScratch(s, "q112") { path =>
      docs.write.mode("overwrite").json(path)
      // schema-pinned read: JSONL carries no types; inference would make
      // the round trip depend on sampled data (and read the files twice)
      val back = s.read.schema(docs.schema).json(path)
      Temporal.tableChecksum(back, docRowKeySpark, Seq("source"))
        // eager: pin the checksums before the temp files are deleted
        .ckptLocal()
    }
  }

  private val q112Sql = {
    val rowKey = "concat_ws('|', CAST(doc_id AS VARCHAR), text, " +
      "coalesce(lang, '<N>'), CAST(n_chars AS VARCHAR))"
    s"""SELECT source, COUNT(*) AS n_rows,
       |  bit_xor(${Dialect.duckHash60(rowKey)}) AS checksum
       |FROM documents GROUP BY source""".stripMargin
  }

  // --- q124: ORC sink → source round trip under the table checksum --------
  // Same drift surface as q112 for Spark's OTHER built-in columnar
  // format: documents → ORC write → read-back → grouped XOR content
  // checksum, oracle-compared against the checksum computed straight
  // from the parquet table. DuckDB cannot read ORC — it doesn't need
  // to: parity(parquet-direct, ORC-round-tripped) proves the sink and
  // source preserve every byte of every column. Scale shape: identical
  // to q112 (partition-parallel write/read + one grouped aggregate).
  private def q124(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    withScratch(s, "q124") { path =>
      docs.write.mode("overwrite").orc(path)
      val back = s.read.schema(docs.schema).orc(path)
      Temporal.tableChecksum(back, docRowKeySpark, Seq("source"))
        .ckptLocal() // pin before the scratch files are deleted
    }
  }

  // --- q118: deterministic corpus shuffle + shard assignment ---------------
  // The global-shuffle job a training pipeline runs before writing
  // shards: every document gets a pseudo-random but DETERMINISTIC
  // position (hash of its id under a fixed salt — reproducible across
  // engines, runs, and cluster sizes, unlike rand()), shard =
  // position mod N, within-shard order = position. The entry emits the
  // per-shard audit row — doc count, byte mass, position range, and an
  // ORDER-SENSITIVE checksum XOR(hash60(rank ':' doc_id)) that flips if
  // any two engines disagree on any shard's total order, not just its
  // membership (the rank folds the order into each term). XOR over a
  // 60-bit hash is overflow-free at ANY shard size — the earlier
  // Σ rank·(doc_id mod P) form grew O(rows²·1e6) per shard and would
  // wrap int64 (silently in Spark, an error via DuckDB's HUGEINT cast)
  // exactly at the scale the entry claims to audit.
  //
  // Scale shape: ONE shuffle keyed by shard (at 100 TB this is
  // `repartition(N, shard)` + `sortWithinPartitions(pos)` straight into
  // the shard writer — the window here is the same partitioning); the
  // rank and the aggregate both run inside that partitioning. N scales
  // with corpus size; 8 keeps the audit readable at test SF.
  private val q118Shards = 8

  private def q118(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = Dialect.sparkHash60("concat(CAST(doc_id AS STRING), ':shuffle')")
    val w = Window.partitionBy("shard")
      .orderBy(col("p").asc, col("doc_id").asc)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), expr(pos).as("p"))
      .withColumn("shard", col("p") % q118Shards)
      .withColumn("rn", row_number().over(w))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("p")).as("first_pos"),
        max(col("p")).as("last_pos"),
        expr("bit_xor(" + Dialect.sparkHash60(
          "concat(CAST(rn AS STRING), ':', CAST(doc_id AS STRING))") +
          ")").as("order_checksum"))
  }

  private val q118Sql = {
    val pos = Dialect.duckHash60("CAST(doc_id AS VARCHAR) || ':shuffle'")
    s"""WITH pos AS (
       |  SELECT doc_id, n_chars, $pos AS p FROM documents
       |), sh AS (
       |  SELECT *, p % $q118Shards AS shard,
       |    ROW_NUMBER() OVER (PARTITION BY p % $q118Shards
       |      ORDER BY p ASC, doc_id ASC) AS rn
       |  FROM pos
       |)
       |SELECT shard, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  MIN(p) AS first_pos, MAX(p) AS last_pos,
       |  bit_xor(${Dialect.duckHash60(
             "CAST(rn AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")})
       |    AS order_checksum
       |FROM sh GROUP BY shard""".stripMargin
  }

  // --- q136: Z-order layout keys + per-block skipping stats ----------------
  // The data-layout primitive behind multi-dimensional file skipping
  // (Delta/Iceberg OPTIMIZE ZORDER): interleave the bits of two clustering
  // dimensions — customer bucket and order-date bucket, each range-mapped
  // to 4 bits — into one Morton key, block rows by the key's upper 4
  // bits, and report each block's per-dimension min/max envelope plus the
  // covered-cell count. Sorting/partitioning 100 TB by z_key is what
  // makes BOTH `WHERE cust=…` and `WHERE date=…` prune most files from
  // footer min/max stats alone; the envelope table IS the skipping index.
  // All arithmetic is exact integer (range-map via integer mul/div, bit
  // interleave via shift|or), so the oracle replays it bit-for-bit.
  // Scale shape: two broadcast 1-row bounds, a stateless per-row
  // projection, one 16-key aggregate — no shuffle of data rows beyond it.
  private def q136(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val bounds = broadcast(o.agg(
      min(col("o_custkey")).as("cmin"), max(col("o_custkey")).as("cmax"),
      min(expr("CAST(o_orderdate AS DATE)")).as("dmin"),
      max(expr("CAST(o_orderdate AS DATE)")).as("dmax")))
    o.crossJoin(bounds)
      .select(
        expr("""CAST((o_custkey - cmin) * 16
               |  DIV (cmax - cmin + 1) AS BIGINT)""".stripMargin).as("bx"),
        expr("""CAST(datediff(CAST(o_orderdate AS DATE), dmin) * 16
               |  DIV (datediff(dmax, dmin) + 1) AS BIGINT)"""
          .stripMargin).as("by"))
      .withColumn("z", expr(
        """(bx & 1) | shiftleft(by & 1, 1)
          || shiftleft(bx & 2, 1) | shiftleft(by & 2, 2)
          || shiftleft(bx & 4, 2) | shiftleft(by & 4, 3)
          || shiftleft(bx & 8, 3) | shiftleft(by & 8, 4)""".stripMargin))
      .groupBy(expr("z DIV 16").as("zblock"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("bx")).as("bx_min"), max(col("bx")).as("bx_max"),
        min(col("by")).as("by_min"), max(col("by")).as("by_max"),
        expr("""CAST((max(bx) - min(bx) + 1) * (max(by) - min(by) + 1)
               |  AS BIGINT)""".stripMargin).as("covered_cells"))
  }

  private val q136Sql =
    """WITH bounds AS (
      |  SELECT MIN(o_custkey) AS cmin, MAX(o_custkey) AS cmax,
      |    MIN(CAST(o_orderdate AS DATE)) AS dmin,
      |    MAX(CAST(o_orderdate AS DATE)) AS dmax
      |  FROM orders
      |), b AS (
      |  SELECT
      |    CAST((o_custkey - cmin) * 16 // (cmax - cmin + 1) AS BIGINT)
      |      AS bx,
      |    CAST(date_diff('day', dmin, CAST(o_orderdate AS DATE)) * 16
      |      // (date_diff('day', dmin, dmax) + 1) AS BIGINT) AS by
      |  FROM orders CROSS JOIN bounds
      |), zb AS (
      |  SELECT bx, by,
      |    (bx & 1) | ((by & 1) << 1)
      |    | ((bx & 2) << 1) | ((by & 2) << 2)
      |    | ((bx & 4) << 2) | ((by & 4) << 3)
      |    | ((bx & 8) << 3) | ((by & 8) << 4) AS z
      |  FROM b
      |)
      |SELECT z // 16 AS zblock, COUNT(*) AS n_rows,
      |  MIN(bx) AS bx_min, MAX(bx) AS bx_max,
      |  MIN(by) AS by_min, MAX(by) AS by_max,
      |  CAST((MAX(bx) - MIN(bx) + 1) * (MAX(by) - MIN(by) + 1) AS BIGINT)
      |    AS covered_cells
      |FROM zb GROUP BY 1""".stripMargin

  // --- q154: schema-evolution read (mergeSchema + partition discovery) -----
  // The long-lived-dataset reality: batch 1 was written before the
  // `o_orderpriority` column existed; batch 2 carries it. One
  // `mergeSchema` read must union the footers into a single schema,
  // null-fill the missing column for old files, AND surface the
  // `batch=N` directory names as a partition column. The audit
  // aggregates per batch — row count, non-null count of the evolved
  // column (0 for the pre-evolution batch, by construction), exact cent
  // sums — and the oracle replays the split straight from the orders
  // table, so parity proves no row was dropped, no value shifted, and
  // the null fill hit exactly the old files. Scale shape: writes and
  // the merged read are partition-parallel; mergeSchema's footer union
  // is per-file metadata, not data; the audit is a 2-group aggregate.
  private def q154(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .withColumn("cents",
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
    withScratch(s, "q154") { path =>
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "cents")
        .write.mode("overwrite").parquet(s"$path/batch=1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "cents", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$path/batch=2")
      val back = s.read.option("mergeSchema", "true").parquet(path)
      back.groupBy(col("batch").cast("long").as("batch"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderpriority")).as("n_prio"),
          countDistinct(col("o_orderpriority")).as("n_prio_kinds"),
          sum(col("cents")).as("sum_cents"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .ckptLocal() // pin before the scratch files are deleted
    }
  }

  private val q154Sql =
    """SELECT 2 - (o_orderkey % 2 = 0)::BIGINT AS batch,
      |  COUNT(*) AS n_rows,
      |  CAST(COUNT(CASE WHEN o_orderkey % 2 = 1
      |    THEN o_orderpriority END) AS BIGINT) AS n_prio,
      |  CAST(COUNT(DISTINCT CASE WHEN o_orderkey % 2 = 1
      |    THEN o_orderpriority END) AS BIGINT) AS n_prio_kinds,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      |FROM orders GROUP BY 1""".stripMargin

  // --- q159: dynamic partition overwrite (incremental backfill) -----------
  // The daily-backfill contract on a partitioned lake table: day 1 lands
  // the full snapshot partitioned by priority; day 2 recomputes ONLY two
  // partitions (every cent value bumped by 1) and overwrites with
  // `partitionOverwriteMode=dynamic` — Spark must replace exactly the
  // partitions present in the increment and leave the other three
  // byte-identical. The audit aggregates the read-back per priority and
  // the oracle replays the expectation straight from orders (+1 cent on
  // the overwritten pair, untouched elsewhere), so parity fails if
  // dynamic mode ever degrades to static truncate-all (the three
  // untouched partitions would vanish) or the increment double-appends
  // (counts would double). The mode rides the WRITER (.option), not
  // session conf — no global state leaked to other entries. Scale
  // shape: both writes and the read are partition-parallel; the
  // overwrite moves only the increment's bytes (the whole point at
  // 100 TB — a 2-partition backfill must not rewrite the table); audit
  // is a 5-group aggregate.
  private def q159(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .withColumn("cents", expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
      .select("o_orderkey", "cents", "o_orderpriority")
    withScratch(s, "q159") { path =>
      o.write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(path)
      o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .withColumn("cents", col("cents") + 1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority").parquet(path)
      s.read.parquet(path)
        .groupBy(col("o_orderpriority").cast("string").as("priority"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("cents")).as("sum_cents"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .ckptLocal() // pin before the scratch files are deleted
    }
  }

  private val q159Sql =
    """SELECT o_orderpriority AS priority, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      |    + (o_orderpriority IN ('1-URGENT', '2-HIGH'))::BIGINT)
      |    AS BIGINT) AS sum_cents,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      |FROM orders GROUP BY 1""".stripMargin

  // --- q243: zone-map manifest + pruned scan (data skipping) ---------------
  // The storage-layer half of predicate pushdown: lineitem lands in
  // time-windowed ingestion files (zfile = 90-day windows of
  // l_shipdate — the layout a daily loader produces), a MANIFEST of
  // per-file zone maps (min/max shipdate + row count) is derived, and a
  // range query [d1, d2] consults the manifest FIRST, reading back only
  // the overlapping files via a partition-pruned scan (Spark prunes the
  // non-surviving directories at planning time — real file skipping,
  // not a post-read filter). The audit row carries both sides of the
  // bargain: files total vs scanned + rows scanned (the I/O saved) AND
  // the exact match count/cents sum from the pruned read (nothing
  // lost). The oracle replays the window arithmetic, manifest, and
  // filter straight from the base table, so the hash-match proves the
  // partitioned write preserved every row, the manifest agrees with the
  // data, and pruning dropped no matching file.
  //
  // Scale shape (100 TB): the manifest is one row per FILE (metadata
  // grain, same as parquet footers / an Iceberg manifest); the pruned
  // read lists only survivor directories; the residual filter+agg runs
  // on survivor rows only. The only driver-side values are the manifest
  // itself (bounded by file count) — the q228 bounded-scalar pattern.
  private val ZWindowDays = 90

  private def q243(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .withColumn("sd", expr("CAST(l_shipdate AS DATE)"))
    val gmin = li.agg(min(col("sd"))).head().getDate(0).toLocalDate
    val d1 = gmin.plusDays(400).toString
    val d2 = gmin.plusDays(800).toString
    val rows = li.select(col("sd"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("cents"),
      expr(s"datediff(sd, DATE'$gmin') DIV $ZWindowDays").as("zfile"))
    withScratch(s, "q243") { path =>
      rows.write.mode("overwrite").partitionBy("zfile").parquet(path)
      val manifest = s.read.parquet(path).groupBy("zfile")
        .agg(min(col("sd")).as("sd_min"), max(col("sd")).as("sd_max"),
          count(lit(1)).as("n_rows"))
        .ckptLocal() // file-count-bounded; read twice below
      val nFiles = manifest.count()
      val surv = manifest
        .filter(col("sd_max") >= lit(d1).cast("date") &&
          col("sd_min") <= lit(d2).cast("date"))
        .select(col("zfile").cast("long")).collect().map(_.getLong(0))
      // partition-pruned read: only survivor directories are scanned
      val scanned = s.read.parquet(path)
        .filter(col("zfile").cast("long").isin(surv.toIndexedSeq: _*))
      scanned.agg(
          count(lit(1)).as("rows_scanned"),
          sum(when(col("sd").between(lit(d1).cast("date"),
            lit(d2).cast("date")), 1L).otherwise(0L)).as("n_match"),
          sum(when(col("sd").between(lit(d1).cast("date"),
            lit(d2).cast("date")), col("cents")).otherwise(0L))
            .as("sum_cents"))
        .select(lit(nFiles).as("n_files"),
          lit(surv.length.toLong).as("n_files_scanned"),
          col("rows_scanned"), col("n_match"), col("sum_cents"))
        .ckptLocal() // pin before the scratch files are deleted
    }
  }

  private val q243Sql =
    s"""WITH src AS (
       |  SELECT CAST(l_shipdate AS DATE) AS sd,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM lineitem
       |), g AS (
       |  SELECT MIN(sd) AS gmin, MIN(sd) + 400 AS d1, MIN(sd) + 800 AS d2
       |  FROM src
       |), f AS (
       |  SELECT date_diff('day', gmin, sd) // $ZWindowDays AS zfile,
       |    sd, cents, d1, d2
       |  FROM src CROSS JOIN g
       |), man AS (
       |  SELECT zfile, MIN(sd) AS sd_min, MAX(sd) AS sd_max,
       |    COUNT(*) AS n_rows, ANY_VALUE(d1) AS d1, ANY_VALUE(d2) AS d2
       |  FROM f GROUP BY 1
       |), surv AS (
       |  SELECT zfile, n_rows FROM man WHERE sd_max >= d1 AND sd_min <= d2
       |)
       |SELECT (SELECT COUNT(*) FROM man) AS n_files,
       |  (SELECT COUNT(*) FROM surv) AS n_files_scanned,
       |  CAST((SELECT COALESCE(SUM(n_rows), 0) FROM surv) AS BIGINT)
       |    AS rows_scanned,
       |  CAST((SELECT COUNT(*) FROM f WHERE sd BETWEEN d1 AND d2)
       |    AS BIGINT) AS n_match,
       |  CAST((SELECT COALESCE(SUM(cents), 0) FROM f
       |    WHERE sd BETWEEN d1 AND d2) AS BIGINT) AS sum_cents""".stripMargin

  // --- q250: STREAMING zone-map manifest maintenance -----------------------
  // q243's manifest, maintained the way a landing zone actually builds
  // it: lineitem arrives as a 4-file stream (maxFilesPerTrigger=1) and
  // each micro-batch FOLDS its per-file (min, max, count) partials into
  // the persisted manifest (read state → union → re-aggregate →
  // overwrite — min/max/count are algebraic, so merge ≡ rebuild
  // exactly; the state parquet IS the manifest, no state store — the
  // q230/q241 conversion argument). The drained manifest is
  // parity-gated against the one-shot batch manifest (zero symmetric
  // difference on every column), and the entry then SERVES a pruning
  // decision from the streamed manifest alone — survivors for the
  // q243 date window, with gmin derived from the manifest itself —
  // the metadata-only query a table service answers without touching
  // data files. Scan-side correctness of that decision is q243's
  // oracle-proven half; this entry pins the maintenance half.
  private def q250(s: SparkSession, dir: String): DataFrame = {
    // epoch pinned ONCE before the stream starts: the file-window
    // arithmetic must not depend on which micro-batch a row lands in
    val gmin = Tables.load(s, dir, "lineitem")
      .agg(min(expr("CAST(l_shipdate AS DATE)"))).head()
      .getDate(0).toLocalDate
    val src = Tables.load(s, dir, "lineitem")
      .withColumn("sd", expr("CAST(l_shipdate AS DATE)"))
      .select(col("sd"),
        expr(s"datediff(sd, DATE'$gmin') DIV $ZWindowDays").as("zfile"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-q250").toString
    src.repartition(4, col("zfile"))
      .write.mode("overwrite").parquet(s"$tmp/in")
    val schema = s.read.parquet(s"$tmp/in").schema
    val state = s"$tmp/manifest"
    val log = s"$tmp/log"
    def manifestOf(df: DataFrame): DataFrame =
      df.groupBy("zfile").agg(min(col("sd")).as("sd_min"),
        max(col("sd")).as("sd_max"), count(lit(1)).as("n_rows"))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
      .writeStream.outputMode("append")
      .foreachBatch { (mb: DataFrame, id: Long) =>
        val bm = manifestOf(mb)
        val merged = (if (java.nio.file.Files.exists(
            java.nio.file.Paths.get(state)))
          s.read.parquet(state).unionByName(bm) else bm)
          .groupBy("zfile").agg(min(col("sd_min")).as("sd_min"),
            max(col("sd_max")).as("sd_max"),
            sum(col("n_rows")).as("n_rows"))
          // materialize BEFORE the overwrite clobbers the state this
          // plan reads (the read-modify-write hazard)
          .ckptLocal(eager = true)
        merged.write.mode("overwrite").parquet(state)
        mb.sparkSession.range(1).select(lit(id).as("batch_id"))
          .write.mode("append").parquet(log)
      }
      .start()
    val (streamed, nBatches) = try {
      q.processAllAvailable()
      (s.read.parquet(state).ckptLocal(eager = false),
        s.read.parquet(log).select("batch_id").distinct().count())
    } finally q.stop()
    val nDiff = streamed.withColumn("side", lit(1))
      .unionByName(manifestOf(src).withColumn("side", lit(2)))
      .groupBy("zfile", "sd_min", "sd_max", "n_rows")
      .agg(count_distinct(col("side")).as("ns"))
      .filter(col("ns") =!= 2)
      .count()
    val d1 = gmin.plusDays(400).toString
    val d2 = gmin.plusDays(800).toString
    graft.ParityGate(
      streamed.agg(
          count(lit(1)).as("n_files"),
          sum(when(col("sd_max") >= lit(d1).cast("date") &&
            col("sd_min") <= lit(d2).cast("date"), 1L).otherwise(0L))
            .as("n_files_scanned"),
          sum(when(col("sd_max") >= lit(d1).cast("date") &&
            col("sd_min") <= lit(d2).cast("date"), col("n_rows"))
            .otherwise(0L)).as("rows_scanned"))
        .withColumn("matches_batch", lit(nDiff == 0L))
        .withColumn("multi_batch", lit(nBatches >= 2L)),
      "q250_stream_zonemap", "matches_batch", "multi_batch")
  }

  private val q250Sql =
    s"""WITH src AS (
       |  SELECT CAST(l_shipdate AS DATE) AS sd FROM lineitem
       |), g AS (
       |  SELECT MIN(sd) AS gmin, MIN(sd) + 400 AS d1, MIN(sd) + 800 AS d2
       |  FROM src
       |), man AS (
       |  SELECT date_diff('day', gmin, sd) // $ZWindowDays AS zfile,
       |    MIN(sd) AS sd_min, MAX(sd) AS sd_max, COUNT(*) AS n_rows,
       |    ANY_VALUE(d1) AS d1, ANY_VALUE(d2) AS d2
       |  FROM src CROSS JOIN g GROUP BY 1
       |)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
       |  CAST(SUM(CASE WHEN sd_max >= d1 AND sd_min <= d2 THEN 1
       |    ELSE 0 END) AS BIGINT) AS n_files_scanned,
       |  CAST(SUM(CASE WHEN sd_max >= d1 AND sd_min <= d2 THEN n_rows
       |    ELSE 0 END) AS BIGINT) AS rows_scanned,
       |  TRUE AS matches_batch, TRUE AS multi_batch
       |FROM man""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q250_stream_zonemap" -> q250 _,
    "q243_zonemap_prune" -> q243 _,
    "q159_partition_overwrite" -> q159 _,
    "q154_schema_evolution" -> q154 _,
    "q136_zorder_layout" -> q136 _,
    "q112_jsonl_roundtrip" -> q112 _,
    "q118_corpus_shuffle" -> q118 _,
    "q124_orc_roundtrip" -> q124 _)

  val oracleSql: Map[String, String] = Map(
    "q250_stream_zonemap" -> q250Sql,
    "q243_zonemap_prune" -> q243Sql,
    "q159_partition_overwrite" -> q159Sql,
    "q154_schema_evolution" -> q154Sql,
    "q136_zorder_layout" -> q136Sql,
    "q112_jsonl_roundtrip" -> q112Sql,
    "q118_corpus_shuffle" -> q118Sql,
    // the oracle reads the SAME documents parquet directly — parity
    // proves the ORC round trip changed nothing
    "q124_orc_roundtrip" -> q112Sql)
}
