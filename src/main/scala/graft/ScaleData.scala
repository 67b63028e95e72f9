package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of an sf fixture directory by KEY-SHIFTED
  * copies — the reproducible generator behind PERFORMANCE.md's sf1
  * scaling table (the driver's own generator isn't shipped, so scaling
  * measurements need a recipe that anyone can re-run). Copy 0 is the
  * original data byte-for-byte; copy i shifts every key column by
  * i·stride with strides far above the sf0.1 key ranges, so primary keys
  * stay unique, every foreign key lands on the matching shifted dim copy,
  * and per-key densities (lines per order, docs per source) are
  * preserved. Non-key payloads are NOT perturbed: each document/vector
  * recurs once per copy, which DENSIFIES the dedup/ANN gates' candidate
  * structure (10 exact dups per doc at 10×) — deliberately, since those
  * gates' cost scales with pair density, not row count, and a scaling
  * measurement that diluted the pairs would flatter exactly the operators
  * that need watching. Region/nation stay unscaled (bounded dims, 25/5
  * rows at any sf — broadcast side by design).
  *
  * Run: `sbt "runMain graft.ScaleData /root/testdata/sf0.1 <outDir> 10"`.
  */
object ScaleData {
  private val DimStride = 1000000L   // cust/supp/part/doc/vec keys
  private val FactStride = 10000000L // order/event keys

  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "testdata_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Union of `copies` copies with the named LONG key columns shifted
      * by i·stride each. */
    def scaled(table: String, shifts: (String, Long)*): DataFrame = {
      val base = Tables.load(spark, src, table)
      (0 until copies).map { i =>
        shifts.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(i * stride))
        }
      }.reduce(_ unionByName _)
    }

    val plan: Seq[(String, DataFrame)] = Seq(
      "region" -> Tables.load(spark, src, "region"),
      "nation" -> Tables.load(spark, src, "nation"),
      "customer" -> scaled("customer", "c_custkey" -> DimStride),
      "supplier" -> scaled("supplier", "s_suppkey" -> DimStride),
      "part" -> scaled("part", "p_partkey" -> DimStride),
      "orders" -> scaled("orders",
        "o_orderkey" -> FactStride, "o_custkey" -> DimStride),
      "lineitem" -> scaled("lineitem", "l_orderkey" -> FactStride,
        "l_partkey" -> DimStride, "l_suppkey" -> DimStride),
      "events" -> scaled("events",
        "event_id" -> FactStride, "user_id" -> DimStride),
      "documents" -> scaled("documents", "doc_id" -> DimStride),
      "embeddings" -> scaled("embeddings", "vec_id" -> DimStride))

    plan.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"$name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
