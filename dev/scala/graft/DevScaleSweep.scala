package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: scale-sweep probe — times the most expensive non-streaming
  * battery entries across a 100× scale span (sf0.01 → sf0.1 → sf1, the
  * last synthesized by [[DevMakeSf1]]) so superlinear behavior (shuffle
  * blowup, state growth, skew) is visible in-repo as time-vs-rows. A
  * scale-safe plan should track the row count roughly linearly once
  * above fixed per-job overhead; a superlinear column is the early
  * warning that a plan would NOT survive the jump to cluster scale.
  * Output is recorded in PERF.md per round.
  *
  * Usage: `runMain graft.DevScaleSweep [entry...]` — default is the
  * round-11 audit set (the 10 most expensive non-streaming entries).
  * sf1 location: env GRAFT_SF1_DIR, default /tmp/graft-sf1.
  */
object DevScaleSweep {
  def main(args: Array[String]): Unit = {
    // Default = the round-11 audit set PLUS the >5x/decade heavyweight
    // tail (round-15 promotion, VERDICT r14 ask #6: q214/q208/q209/q210
    // must always have a next-decade datapoint when sf30 is present).
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q101_pipeline_e2e", "q129_curation_v2", "q127_semantic_survivors",
        "q107_pagerank", "q103_domain_cap_etld", "q130_table_profile",
        "q139_basket_pairs", "q120_dup_spans", "q125_embed_clusters",
        "q110_overlap_matrix",
        "q208_containment_join", "q209_dbscan", "q210_kcore",
        "q214_exact_curation", "q217_containment_lsh")
    val sf1Dir = sys.env.getOrElse("GRAFT_SF1_DIR", "/tmp/graft-sf1")
    // optional 4th decade: present only when DevMakeSf1 has been chained
    // (`runMain graft.DevMakeSf1 /tmp/graft-sf1 /tmp/graft-sf10 10 n`)
    val sf10Dir = sys.env.getOrElse("GRAFT_SF10_DIR", "/tmp/graft-sf10")
    // optional 5th decade-step (×3): chained via
    // `runMain graft.DevMakeSf1 /tmp/graft-sf10 /tmp/graft-sf30 100 x 3`
    val sf30Dir = sys.env.getOrElse("GRAFT_SF30_DIR", "/tmp/graft-sf30")
    val sfs = Seq(
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1",
      "sf1" -> sf1Dir) ++
      (if (new java.io.File(sf10Dir).isDirectory) Seq("sf10" -> sf10Dir)
       else Nil) ++
      (if (new java.io.File(sf30Dir).isDirectory) Seq("sf30" -> sf30Dir)
       else Nil)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def exec(n: String, dir: String): Unit =
      SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").format("noop").save()

    // row counts of each probe's driving table, for the time-vs-rows read
    val table = Map(
      "q20_sweepline" -> "orders", "q26_minhash_lsh" -> "documents",
      "q50_dedup_clusters" -> "documents", "q78_session_window" -> "events",
      "q87_repetition" -> "documents", "q88_vocabulary" -> "documents",
      "q89_quantization" -> "embeddings", "q90_curation_pipeline" -> "documents",
      "q91_fuzzy_match" -> "part", "q212_golden_records" -> "part",
      "q92_gap_fill" -> "events",
      "q93_table_checksum" -> "orders", "q94_stratified_sample" -> "documents",
      "q82_sliding_window" -> "events", "q80_token_packing" -> "documents",
      "q95_packing_scan" -> "documents", "q97_rest_ingest" -> "events",
      "q98_pii_redact" -> "documents", "q99_lm_score" -> "documents",
      "q100_gapfill_multi" -> "events", "q101_pipeline_e2e" -> "events",
      "q102_domain_cap" -> "documents", "q103_domain_cap_etld" -> "documents",
      "q110_overlap_matrix" -> "documents", "q193_contamination" -> "documents",
      "q194_split_leakage" -> "documents", "q195_incremental_dedup" -> "documents",
      "q197_mixture_cap" -> "documents", "q116_cohort_retention" -> "events",
      "q117_funnel" -> "events", "q120_dup_spans" -> "documents",
      "q121_bpe_encode" -> "documents", "q206_exact_simjoin" -> "documents",
      "q208_containment_join" -> "documents",
      "q214_exact_curation" -> "documents",
      "q217_containment_lsh" -> "documents",
      "q218_modularity" -> "documents",
      "q219_sorted_neighborhood" -> "documents",
      "q220_blocking_quality" -> "documents",
      "q221_rrf_fusion" -> "documents",
      "q222_mmr_diversify" -> "documents",
      // q223/q225 build the trade graph from lineitem+orders — they
      // stay on the "lineitem" default for row counts
      "q224_rank_agreement" -> "documents",
      "q226_snb_multipass" -> "documents",
      "q227_snb_incremental" -> "documents",
      "q228_heavy_hitters" -> "events",
      "q229_pps_sample" -> "documents",
      "q231_kcenter_select" -> "embeddings",
      "q232_langid_nb" -> "documents",
      "q233_temp_apportion" -> "documents",
      "q234_cluster_purity" -> "embeddings",
      "q235_cluster_nmi" -> "embeddings",
      "q236_semdedup" -> "embeddings",
      "q237_dsir_select" -> "documents",
      "q238_textrank" -> "documents",
      "q239_kmv_distinct" -> "documents",
      "q240_kmv_jaccard" -> "documents",
      "q241_stream_kmv_merge" -> "documents",
      "q245_column_profile" -> "orders",
      "q247_mutual_nn" -> "embeddings",
      "q249_attribution" -> "events",
      "q251_shot_boundaries" -> "documents",
      "q252_seasonal_mase" -> "events",
      // q242/q243/q244/q246/q248/q250/q253 drive lineitem — the default
      "q209_dbscan" -> "embeddings")
      .withDefaultValue("lineitem")

    names.foreach { n =>
      exec(n, "/root/testdata/sf0.001") // warm JIT/codegen once
      spark.catalog.clearCache()
      val cells = sfs.map { case (label, dir) =>
        val rows = spark.read.parquet(s"$dir/${table(n)}.parquet").count()
        // min-of-3: the estimator robust to external contention
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          exec(n, dir)
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }.min
        f"$label=$t%.2fs/$rows%,d rows"
      }
      println(s"SCALE $n  ${cells.mkString("  ")}")
    }
    spark.stop()
  }
}
