package graft.ops

import graft.SparkTestBase

/** Pins the hot-gram cap in [[Dedup.fuzzyCandidatePairs]]: on a
  * stop-gram-saturated vocabulary the candidate count must stay
  * near-linear in the vocabulary (the uncapped inverted-index self-join
  * is quadratic in the names sharing a stop gram), while the final
  * operator still returns exactly the qualifying pairs.
  *
  * Vocabulary shape: every name = 16 hex chars (deterministic hash of its
  * index — 14 high-diversity trigrams, document frequency ~1) + the shared
  * 12-char suffix "commonsuffix" (10 trigrams, document frequency = the
  * whole vocabulary — maximal stop grams). Each name has > K distinct
  * grams, so the probe side indexes only the rare hash-prefix grams and
  * the stop-gram buckets get a near-empty probe side. The uncapped join
  * would emit ≥ N·(N−1)/2 pairs from the suffix buckets alone.
  */
class FuzzySkewSpec extends SparkTestBase {

  private val N = 400

  private def hexPrefix(i: Int): String = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s"fuzzy-$i")
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s"skew-$i")
    f"$h1%08x$h2%08x"
  }

  private def skewVocab: Seq[String] =
    (0 until N).map(i => hexPrefix(i) + "commonsuffix")

  test("stop-gram-saturated vocab: candidate count near-linear, not vocab²") {
    val spark0 = spark
    import spark0.implicits._
    val df = skewVocab.toDF("nm")
    val nCand = Dedup.fuzzyCandidatePairs(df, "nm").count()
    // The uncapped inverted-index self-join yields ≥ N(N−1)/2 ≈ 80k pairs
    // (every pair shares the 10 suffix grams). Capped: candidates arise
    // only from hash-prefix gram collisions — expected a handful. 16×N is
    // generous headroom while still 10× under quadratic.
    assert(nCand <= 16L * N, s"candidate blow-up: $nCand pairs from $N names")
    // and no hash-prefix pair is within maxDist=3 (16 independent hex
    // chars), so the exact operator returns empty on this vocab
    assert(Dedup.fuzzyNamePairs(df, "nm").count() === 0L)
  }

  test("capped candidates still find every qualifying pair in the skew corpus") {
    val spark0 = spark
    import spark0.implicits._
    val base = hexPrefix(5) + "commonsuffix"
    val ins = hexPrefix(5) + "commonsuffixz" // 1 append
    val sub = "!" + hexPrefix(7).drop(1) + "commonsuffix" // 1 substitution
    val vocab = skewVocab ++ Seq(ins, sub)
    val got = Dedup.fuzzyNamePairs(vocab.toDF("nm"), "nm")
      .select("name_a", "name_b", "edit_dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val insPair = (Seq(base, ins).min, Seq(base, ins).max, 1L)
    val subBase = hexPrefix(7) + "commonsuffix"
    val subPair = (Seq(subBase, sub).min, Seq(subBase, sub).max, 1L)
    assert(got.contains(insPair), s"missing append pair in $got")
    assert(got.contains(subPair), s"missing subst pair in $got")
  }
}
