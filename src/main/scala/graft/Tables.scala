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
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    // Timestamp columns have shipped in several physical encodings across
    // testdata regenerations; normalize every one to TimestampType so
    // downstream instant-based functions (unix_micros, window, etc.)
    // always apply:
    //  - events.ts as TIMESTAMP(NANOS): Spark reads long nanos under
    //    spark.sql.legacy.parquet.nanosAsLong (set by Verify/Bench/tests).
    //    `div` is integral long division — ns (~1.7e18) overflows double math.
    //  - ANY column as timestamp[us] without timezone (the current
    //    regeneration stores events.ts, o_orderdate, and l_shipdate this
    //    way): Spark reads TIMESTAMP_NTZ. Sessions run in UTC everywhere
    //    (Bench/Verify/tests), so reinterpreting the naive value as a UTC
    //    instant is lossless and matches the DuckDB oracle's epoch math.
    //    Mirrors the reference's forced-UTC discipline
    //    (data_diff/databases/_connect.py:288-303).
    val df =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    if (df.schema.fields.exists(_.dataType == TimestampNTZType))
      df.select(df.schema.fields.map(f =>
        if (f.dataType == TimestampNTZType) col(f.name).cast(TimestampType).as(f.name)
        else col(f.name)).toIndexedSeq: _*)
    else df
  }
}
