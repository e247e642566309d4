package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 REST query-log source (SURVEY §2.1 S4): the engine-native
  * replacement for the reference's Cloudera Manager pagination loop
  * (impala_query_sizing.py:134–165).
  *
  * Reference semantics reproduced per partition:
  *   - pages of `limit` rows via `offset`, terminating when a page is
  *     short AND warning-free (py:338–339);
  *   - the adaptive time-window cursor: a server truncation warning
  *     carries a new end-of-window date in its last token — the reader
  *     shifts `to` and resets `offset` (py:152–158);
  *   - the server-side filter `queryType=QUERY and executing=false
  *     [and pool=P]` plus the from/to window (py:139–141).
  *
  * Spark-native parts the reference cannot do:
  *   - PARALLEL ingest: the [from,to) window splits into `slices` time
  *     slices, one InputPartition each — pages stream concurrently per
  *     slice instead of one global sequential cursor;
  *   - filter pushdown (SupportsPushDownFilters): `pool = 'x'` and
  *     startTime bounds from a Spark `filter()` land in the request URL,
  *     so the server prunes before the wire.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.RestQuerylogSource")
  *   .option("url", "https://host:7183/api/v19/.../impalaQueries")
  *   .option("from", "2021-07-12T00:00:00Z").option("to", "...")
  *   .option("slices", "8").load()
  * }}}
  *
  * HTTP is behind [[PageFetcher]]: `fetcher=jvm` (default) uses
  * HttpURLConnection with basic auth (user/passwordFile options,
  * base64-decoded like py:95–96); tests register deterministic fakes via
  * [[PageFetcher.register]].
  */
class RestQuerylogSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestQuerylogSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestQuerylogTable(properties)
}

object RestQuerylogSource {
  /** API-mode document shape (py:189–208): scalar query fields + the
    * nested `attributes` string map the sizing metrics live in. `pool` is
    * surfaced as a top-level column (extracted from `attributes.pool` by
    * the reader) so a Spark `filter(col("pool") === ...)` is expressible
    * and pushable into the server-side request filter.
    */
  val schema: StructType = StructType(Seq(
    StructField("queryId", StringType, nullable = false),
    StructField("startTime", StringType, nullable = false),
    StructField("endTime", StringType, nullable = true),
    StructField("durationMillis", LongType, nullable = false),
    StructField("queryState", StringType, nullable = true),
    StructField("user", StringType, nullable = true),
    StructField("queryType", StringType, nullable = true),
    StructField("pool", StringType, nullable = true),
    StructField("attributes", MapType(StringType, StringType),
      nullable = true)))
}

private[sources] class RestQuerylogTable(props: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"rest_querylog(${props.get("url")})"
  override def schema(): StructType = RestQuerylogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val merged = new util.HashMap[String, String](props)
    merged.putAll(options.asCaseSensitiveMap())
    new RestScanBuilder(merged)
  }
}

private[sources] class RestScanBuilder(props: util.Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters {

  private var pushedPool: Option[String] = None
  private var pushedFrom: Option[String] = None
  private var pushedTo: Option[String] = None

  /** F1 pushdown (py:139–141): pool equality + startTime range reach the
    * server; everything else stays a Spark-side residual. startTime
    * bounds are claimed ONLY when the literal parses as a strict ISO-8601
    * instant — the window splitter calls `Instant.parse` on them, so a
    * date-only or offset-formatted literal must stay a residual filter
    * instead of crashing the scan at planning.
    */
  private def isInstant(v: String): Boolean =
    scala.util.Try(java.time.Instant.parse(v)).isSuccess

  override def pushFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot {
      case EqualTo("pool", v: String) => pushedPool = Some(v); true
      case GreaterThanOrEqual("startTime", v: String) if isInstant(v) =>
        pushedFrom = Some(v); true
      case LessThan("startTime", v: String) if isInstant(v) =>
        pushedTo = Some(v); true
      case _ => false
    }

  override def pushedFilters(): Array[Filter] =
    (pushedPool.map(EqualTo("pool", _)).toSeq ++
      pushedFrom.map(GreaterThanOrEqual("startTime", _)) ++
      pushedTo.map(LessThan("startTime", _))).toArray

  override def build(): Scan = new RestScan(RestConfig(
    url = props.get("url"),
    user = Option(props.get("user")),
    password = Option(props.get("passwordFile")).map { p =>
      new String(java.util.Base64.getDecoder.decode(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p))).trim)) // py:95–96
    },
    from = pushedFrom.orElse(Option(props.get("from")))
      .getOrElse(sys.error("'from' option or startTime >= filter required")),
    to = pushedTo.orElse(Option(props.get("to")))
      .getOrElse(sys.error("'to' option or startTime < filter required")),
    pool = pushedPool.orElse(Option(props.get("pool"))),
    limit = Option(props.get("limit")).map(_.toInt).getOrElse(1000),
    slices = Option(props.get("slices")).map(_.toInt).getOrElse(1),
    fetcher = Option(props.get("fetcher")).getOrElse("jvm")))
}

private[sources] case class RestConfig(url: String, user: Option[String],
    password: Option[String], from: String, to: String,
    pool: Option[String], limit: Int, slices: Int, fetcher: String)

private[sources] case class RestSlice(cfg: RestConfig, from: String,
    to: String) extends InputPartition

private[sources] class RestScan(cfg: RestConfig) extends Scan with Batch {
  override def readSchema(): StructType = RestQuerylogSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"RestQuerylog ${cfg.url} [${cfg.from}, ${cfg.to}) " +
      s"pool=${cfg.pool.getOrElse("*")} slices=${cfg.slices}"

  /** Evenly split [from, to) into `slices` UTC-second slices. */
  override def planInputPartitions(): Array[InputPartition] = {
    val f = java.time.Instant.parse(cfg.from)
    val t = java.time.Instant.parse(cfg.to)
    val n = math.max(1, cfg.slices)
    val step = math.max(1L, (t.getEpochSecond - f.getEpochSecond) / n)
    (0 until n).map { i =>
      val lo = f.plusSeconds(step * i)
      val hi = if (i == n - 1) t else f.plusSeconds(step * (i + 1))
      RestSlice(cfg, lo.toString, hi.toString)
    }.filter(s => s.from < s.to).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new RestPageReader(partition.asInstanceOf[RestSlice])
}

/** Streams one time slice: page-by-page fetch with the reference's
  * termination + adaptive-window rules. Holds at most one page in memory.
  */
private[sources] class RestPageReader(slice: RestSlice)
    extends PartitionReader[InternalRow] {
  private val cfg = slice.cfg
  private val fetch = PageFetcher.resolve(cfg.fetcher, cfg)

  private var offset = 0
  private var to = slice.to
  private var done = false
  private var page: Iterator[InternalRow] = Iterator.empty

  private def buildUrl: String = {
    val poolPred = cfg.pool.map(p => s" and pool = $p").getOrElse("")
    val filter = java.net.URLEncoder.encode(
      s"queryType = QUERY and executing = false$poolPred", "UTF-8")
    s"${cfg.url}?from=${slice.from}&to=$to&filter=$filter" +
      s"&limit=${cfg.limit}&offset=$offset"
  }

  /** A truncation warning's last token must be a timestamp (the narrowed
    * window end). Accepts strict instants and date-only forms; anything
    * else (an unrelated server warning) must NOT poison the `to` cursor.
    */
  private def windowEnd(tok: String): Option[java.time.Instant] =
    scala.util.Try(java.time.Instant.parse(tok)).toOption
      .orElse(scala.util.Try(java.time.LocalDate.parse(tok)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant).toOption)

  private def loadNextPage(): Boolean = {
    if (done) return false
    val body = fetch(buildUrl)
    val (rows, warning) = RestJson.parsePage(body)
    page = rows.iterator
    // py:150–161: the truncation-window shift applies only when the page
    // is SHORT (query_count < limit) and the warning's last token parses
    // as a date that strictly narrows the window; a full page with a
    // warning, or a non-truncation warning, paginates normally instead of
    // re-reading the narrowed window from offset 0 (duplicate rows).
    val shift = warning
      .filter(_ => rows.size < cfg.limit)
      .map(_.split(' ').last)
      .flatMap(tok => windowEnd(tok).map(tok -> _))
      .filter { case (_, inst) => windowEnd(to).forall(inst.isBefore) }
    shift match {
      case Some((tok, _)) =>
        to = tok
        offset = 0
      case None if rows.size < cfg.limit && warning.isEmpty =>
        done = true // py:338–339
      case None if rows.isEmpty =>
        done = true // short, warned, un-shiftable: nothing left to read
      case None =>
        // advance by the rows actually received: equals cfg.limit on a
        // full page (py:160), and on a short-but-warned page it resumes
        // exactly after the last row instead of skipping limit−size rows
        offset += rows.size
    }
    rows.nonEmpty || !done
  }

  override def next(): Boolean = {
    while (!page.hasNext) if (!loadNextPage() && !page.hasNext) return false
    true
  }
  override def get(): InternalRow = page.next()
  override def close(): Unit = ()
}

/** JSON page decode (S5, py:147+165+189–208) via Spark's shipped Jackson. */
private[sources] object RestJson {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  private val mapper = new ObjectMapper()

  /** @return (rows, truncation-warning text if present) */
  def parsePage(body: String): (Seq[InternalRow], Option[String]) = {
    val root = mapper.readTree(body)
    val rows = Option(root.get("queries")).toSeq.flatMap { qs =>
      (0 until qs.size()).map(i => toRow(qs.get(i)))
    }
    val warning = Option(root.get("warnings"))
      .filter(w => w.isArray && w.size() > 0)
      .map(_.get(0).asText())
    (rows, warning)
  }

  private def utf8(n: JsonNode, field: String): UTF8String =
    Option(n.get(field)).filterNot(_.isNull)
      .map(v => UTF8String.fromString(v.asText())).orNull

  private def toRow(q: JsonNode): InternalRow = {
    val attrs = Option(q.get("attributes")).filterNot(_.isNull).map { a =>
      val names = a.fieldNames()
      val keys = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      val vals = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      while (names.hasNext) {
        val k = names.next()
        keys += UTF8String.fromString(k)
        vals += UTF8String.fromString(a.get(k).asText())
      }
      ArrayBasedMapData(keys.toArray, vals.toArray)
    }.orNull
    val pool = Option(q.get("attributes")).filterNot(_.isNull)
      .flatMap(a => Option(a.get("pool")))
      .map(p => UTF8String.fromString(p.asText())).orNull
    InternalRow(
      utf8(q, "queryId"), utf8(q, "startTime"), utf8(q, "endTime"),
      Option(q.get("durationMillis")).map(_.asLong()).getOrElse(0L),
      utf8(q, "queryState"), utf8(q, "user"), utf8(q, "queryType"), pool,
      attrs)
  }
}

/** Pluggable page transport. `jvm` performs a real basic-auth GET; tests
  * register in-memory fakes under other keys (local-mode only — a real
  * cluster resolves registered fetchers per-executor).
  */
object PageFetcher {
  type Fetch = String => String
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Fetch]()

  def register(key: String, f: Fetch): Unit = registry.put(key, f)

  def resolve(key: String, cfg: RestConfig): Fetch = key match {
    case "jvm" => jvmFetch(cfg)
    case k =>
      Option(registry.get(k)).getOrElse(
        sys.error(s"unknown fetcher '$k' — register it via PageFetcher.register"))
  }

  private def jvmFetch(cfg: RestConfig): Fetch = url => {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    for (u <- cfg.user; p <- cfg.password) {
      val token = java.util.Base64.getEncoder
        .encodeToString(s"$u:$p".getBytes("UTF-8"))
      conn.setRequestProperty("Authorization", s"Basic $token")
    }
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    if (code != 200) sys.error(s"HTTP $code from $url") // py:142
    val src = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
    try src.mkString finally { src.close(); conn.disconnect() }
  }
}
