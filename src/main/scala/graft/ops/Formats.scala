package graft.ops

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  private def q112(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("graft-q112-")
    try {
      val path = s"$tmp/docs_jsonl"
      docs.write.mode("overwrite").json(path)
      // schema-pinned read: JSONL carries no types; inference would make
      // the round trip depend on sampled data (and read the files twice)
      val back = s.read.schema(docs.schema).json(path)
      Temporal.tableChecksum(back, docRowKeySpark, Seq("source"))
        // eager: pin the checksums before the temp files are deleted
        .localCheckpoint()
    } finally graft.Fs.deleteRecursively(tmp)
  }

  private val q112Sql = {
    val rowKey = "concat_ws('|', CAST(doc_id AS VARCHAR), text, " +
      "coalesce(lang, '<N>'), CAST(n_chars AS VARCHAR))"
    s"""SELECT source, COUNT(*) AS n_rows,
       |  bit_xor(${Dialect.duckHash60(rowKey)}) AS checksum
       |FROM documents GROUP BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q112_jsonl_roundtrip" -> q112 _)

  val oracleSql: Map[String, String] = Map(
    "q112_jsonl_roundtrip" -> q112Sql)
}
