package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted plans for headline queries so plan shape regressions
  * are visible (run manually; not part of the driver contract). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_filter_pushdown", "q5_region_revenue", "q_joindiff",
        "q_scan_project", "q_join_broadcast", "q_hashdiff_segments",
        "q_ngram_jaccard", "q_dup_ngram_fraction", "q_dedup_survivors",
        "q_topk_groups", "q_ann_lsh", "q_bloom_decontaminate",
        "q_semantic_dedup", "q_bm25_rank", "q_pipeline_e2e",
        "q_quantiles_sketch", "q_pack_sequences",
        "q_zorder_key", "q_zorder_segments", "q_dsir_weights",
        "q_kmv_setops", "q_anomaly_mad")
    interesting.foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
