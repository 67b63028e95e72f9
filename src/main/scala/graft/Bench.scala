package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional filter for local iteration: SPARK_GRAFT_ONLY=q_a,q_b
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // name-sorted so warmup attribution and per-query numbers are
    // comparable across runs and rounds (Map iteration order is arbitrary)
    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(kv => f(kv._1)))
      .toSeq.sortBy(_._1)
    // Warm every table (page cache + parquet footer reads) plus the
    // JVM/codegen paths outside the timed loop — one cold count() on the
    // first query otherwise absorbs ~5s of warmup and single-shot timings
    // inherit JIT/GC state from whatever ran before (observed up to 6x
    // in-suite vs isolated swings on identical code).
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"))
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }
    // Repeat each query and report the MINIMUM: timing noise in a shared
    // JVM is strictly additive (GC pauses, page-cache misses, JIT deopt,
    // CPU contention all add time, never subtract), so the fastest repeat
    // is the best estimator of the plan's true cost. Median-of-3 still
    // drifted when a whole run window was slow (observed: q_pivot medians
    // 0.17 s vs 1.54 s across two back-to-back runs of identical code);
    // minima across those same runs agree.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt.max(1)
    val results = selected.map { case (name, fn) =>
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        // a failed query must be LOUD, not a suspiciously fast timing: the
        // error goes to stderr and the recorded time is poisoned to a huge
        // sentinel (not Infinity — that would break the JSON line) so a
        // crash can never read as a perf win in cross-round comparisons.
        // the noop sink, NOT df.count(): a count() on top lets Catalyst
        // prune every column the count doesn't need, so map-shaped queries
        // whose cost lives in projected columns (quantization signatures,
        // chunk hashes, dup flags fed by a left join) would time a plan
        // with the actual work optimized away — observed: q_semantic_dedup
        // "ran" a 20M-pair similarity in 0.17 s because pruning is_dup
        // eliminated the whole similarity join. The noop write materializes
        // every output column as written, with no driver transfer.
        val ok = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            false
        }
        if (ok) (System.nanoTime() - t0) / 1e9 else 999999.0
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The full line carries one key per gate (~130) and has been observed
    // truncated mid-key by tail-limited log capture, losing every
    // per-query number. Defend twice: print a short totals-only line
    // FIRST (survives head-limited capture), and write the complete JSON
    // to a file (survives any capture — committed per round), then print
    // the full contract line last (survives tail-limited capture).
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","detail":"bench_last.json"}""")
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json"))
    // best-effort: an unwritable path (read-only cwd, bad BENCH_OUT) must
    // not take down the full contract line below — the file is the backup
    // for the stdout line, never the other way around
    scala.util.Try(java.nio.file.Files.write(out, (full + "\n").getBytes("UTF-8")))
      .failed.foreach(e =>
        Console.err.println(s"[bench] could not write $out: ${e.getMessage}"))
    println(full)
    spark.stop()
  }
}
