package graft.sizing

import org.scalatest.funsuite.AnyFunSuite

/** Config loader (SURVEY §2.1 S1) — the reference's flat key=value format
  * (impala_query_sizing.py:88–117) and its derived constants.
  */
class SizingConfigSpec extends AnyFunSuite {

  test("defaults reproduce sizing.conf") {
    val c = SizingConfig()
    assert(c.cacheGbPerNode == 1000)
    assert(c.queryMemPerNode == 200)
    assert(c.vcoresPerNode == 16)
    assert(c.podLimit == 100)
    assert(c.pool.isEmpty)
  }

  test("mt scaling factor: mt_dop=12 => 5.4 (py:112)") {
    assert(SizingConfig(mtDop = 12).mtScalingFactor == 5.4)
    assert(SizingConfig(mtDop = 1).mtScalingFactor == 1.0)
  }

  test("parallel factor = max(mtScalingFactor, vcores) (Q4)") {
    assert(SizingConfig().parallelFactor == 16.0)
    assert(SizingConfig(vcoresPerNode = 2).parallelFactor == 5.4)
  }

  test("fromProperties parses key=value with comments and blanks") {
    val c = SizingConfig.fromProperties(
      """# a comment
        |
        |cache_gb_per_node=500
        |pod_limit = 42
        |pool=etl
        |input_file=
        |""".stripMargin)
    assert(c.cacheGbPerNode == 500)
    assert(c.podLimit == 42)
    assert(c.pool.contains("etl"))
    assert(c.inputFile.isEmpty) // empty value => unset (Q8 optionality)
  }

  test("values containing '=' keep everything after the first separator") {
    val c = SizingConfig.fromProperties("pool=a=b")
    assert(c.pool.contains("a=b"))
  }
}
