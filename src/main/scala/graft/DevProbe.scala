package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: probe Spark SQL semantics for cross-engine (DuckDB) parity. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def p(name: String, sql: String): Unit =
      try println(s"$name => " + spark.sql(s"SELECT $sql").collect()(0))
      catch { case e: Throwable => println(s"$name ERR ${e.getMessage.linesIterator.next()}") }

    p("md5conv", "CAST(conv(substring(md5('abc'),1,15),16,10) AS BIGINT)")
    p("split_keep", "split('a b  c ', ' ')")
    p("split_size", "size(split('a b  c ', ' '))")
    p("regex_all", "regexp_extract_all('ab1 cd2', '[a-z]+', 0)")
    p("shift_col", "transform(sequence(0,3), j -> shiftright(13, j) & 1)")
    p("nested_lambda", "transform(sequence(0,2), j -> aggregate(array(1L,2L,3L), 0L, (a,h) -> a + 2*((shiftright(h, j)) & 1) - 1))")
    p("zip_dot", "aggregate(transform(sequence(1,3), i -> CAST(element_at(array(CAST(0.5 AS FLOAT), CAST(0.25 AS FLOAT), CAST(2.0 AS FLOAT)), i) AS DOUBLE) * CAST(element_at(array(CAST(4.0 AS FLOAT), CAST(3.0 AS FLOAT), CAST(0.125 AS FLOAT)), i) AS DOUBLE)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    p("array_min", "array_min(transform(sequence(1,3), i -> i*7 % 5))")
    p("ngrams", "transform(sequence(1, greatest(length('abcdefgh')-2, 1)), i -> substring('abcdefgh', i, 3))")
    p("mod_hash", "CAST(conv(substring(md5('abc'),1,15),16,10) AS BIGINT) % 2147483647")
    p("neg_mod", "CAST(-7 AS BIGINT) % 3")
    p("substr_blob", "substring(CAST('abcdef' AS BINARY), 2, 3)")
    p("md5_bin", "md5(CAST('abc' AS BINARY))")
    p("octet", "octet_length(CAST('abc' AS BINARY))")
    p("arr_contains", "array_contains(array('a','b'), 'a')")
    p("arr_intersect_size", "size(array_intersect(array('a','b','c'), array('b','c','d')))")
    p("sort_arr", "sort_array(array_distinct(array('b','a','b')))")
    p("round_dec", "round(CAST(0.123456789012345 AS DECIMAL(20,12)), 6)")
    p("least_str", "least('b', 'a')")
    p("pmod", "pmod(-7, 3)")
    spark.stop()
  }
}
