package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet star schema (see TESTDATA.md).
  * All queries take the sf directory as a parameter so the same plan runs at
  * any scale factor — locally on parquet files, on a cluster against the
  * same layout at 100 TB.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): Spark reads it as long nanos
    // under spark.sql.legacy.parquet.nanosAsLong (set by Verify/Bench/tests).
    // Re-expose it as a proper TimestampType truncated to micros. `div` is
    // integral long division — ns values (~1.7e18) overflow double math.
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
