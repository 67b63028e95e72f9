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
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts has shipped in three physical encodings across testdata
    // regenerations; normalize every one to TimestampType so downstream
    // instant-based functions (unix_micros, window, etc.) always apply:
    //  - TIMESTAMP(NANOS): Spark reads long nanos under
    //    spark.sql.legacy.parquet.nanosAsLong (set by Verify/Bench/tests).
    //    `div` is integral long division — ns (~1.7e18) overflows double math.
    //  - timestamp[us] without timezone: Spark reads TIMESTAMP_NTZ. Sessions
    //    run in UTC everywhere (Bench/Verify/tests), so reinterpreting the
    //    naive value as a UTC instant is lossless and matches the DuckDB
    //    oracle's epoch math. Mirrors the reference's forced-UTC discipline
    //    (data_diff/databases/_connect.py:288-303).
    if (name == "events") df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", df.col("ts").cast(TimestampType))
      case _ => df
    }
    else df
  }
}
