package graft.ops

/** Cross-engine SQL fragments shared by the Spark implementations and
  * their DuckDB oracle mirrors.
  *
  * The driver's correctness gate hash-compares Spark output with DuckDB
  * output, so every non-trivial scalar computation must be expressible
  * IDENTICALLY (bit-for-bit) in both engines. The workhorse is a
  * deterministic 60-bit integer hash shared by both: the first 15 hex
  * digits of md5, parsed base-16. md5 is bytewise-identical everywhere;
  * 15 hex digits (60 bits) fit a signed 64-bit integer, so no overflow
  * and no sign games on either engine.
  *
  * ==DuckDB version pin==
  * The oracle dialect is written against and dev-verified on DuckDB
  * '''1.0.0''' (`dev/compare.py` asserts its own duckdb matches the pin
  * and refuses to run otherwise, so a version skew fails the dev gate
  * rather than surfacing as an unexplained driver red row). Dialect
  * policy learned the hard way (q111 `\s`, q132 `log2`, r13's
  * q207 `list(v ORDER BY j)`): every oracle restricts itself to
  * constructs with stable cross-version semantics — plain arithmetic,
  * SUM/COUNT/MIN/MAX, ROW_NUMBER, CASE, COALESCE, md5 — and avoids
  * ORDER BY inside `list()` aggregates entirely (`string_agg(.. ORDER
  * BY ..)` stays — it is driver-proven green in q120/q177).
  */
object Dialect {

  /** Spark SQL: 60-bit md5-derived hash of expression `e`. */
  def sparkHash60(e: String): String =
    s"CAST(conv(substring(md5($e),1,15),16,10) AS BIGINT)"

  /** DuckDB SQL: the same 60-bit hash (DuckDB has no base-16 conv; fold
    * the hex digits instead — exact same value).
    */
  def duckHash60(e: String): String =
    s"list_reduce(list_transform(string_split(substr(md5($e),1,15), ''), " +
      s"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), " +
      s"(a,b) -> a*16+b)"

  /** Spark SQL: dot product of two float arrays in DOUBLE, folded
    * left-to-right element by element. The fold order is part of the
    * contract: IEEE-754 addition is not associative, so the oracle must
    * evaluate the exact same shape (see [[duckDot]]) for bit parity.
    */
  def sparkDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      s"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  /** DuckDB SQL: the same left-to-right double dot product. */
  def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, v) -> acc + v)"
}
