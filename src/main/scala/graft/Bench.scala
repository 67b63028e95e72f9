package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Recorded instead of a time when a gate throws: poisons the total
    * loudly (never Infinity — that would break the JSON line) and is
    * excluded from every bench_best merge. */
  private val FailedSentinel = 999999.0

  /** JDK17 module opens for a child JVM that builds a SparkSession outside
    * spark-submit — mirrors build.sbt / spark-submit's own defaults. Needed
    * by `--repin`, which forks bare `java` processes. */
  private val addOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Extract per-gate seconds from our own bench JSON ("queries":{"q_x":1.2,…}).
    * Regex is fine here: the format is ours, flat, and machine-written. Gate
    * names start with `q` but NOT all with `q_` (q1_agg, q5_region_revenue);
    * requiring a numeric value keeps envelope keys (queries, sf, …) out. */
  private[graft] def parseGateTimes(json: String): Map[String, Double] =
    "\"(q[A-Za-z0-9_]*)\"\\s*:\\s*([0-9][0-9.eE+-]*)".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  /** Silence two benign per-execution WARN categories for this JVM — each
    * emits dozens of lines that bury the bench contract tail:
    *  - WindowExec's "No Partition Defined": the engine's only two
    *    unpartitioned windows are provably bounded (the top-50 cumulative
    *    sum in q_vocab_coverage; TableSegment's sampled ntile checkpoints).
    *    A literal partitionBy can't fix it (Spark 4's
    *    EliminateWindowPartitions strips foldable partition specs);
    *  - DataSource's "All paths were ignored": deliberate plain-reader
    *    compat checks do `spark.read.parquet(layoutDir)` on dirs whose
    *    only non-data entries are the hidden `_graft_*` logs — exactly
    *    the contract (underscore paths are invisible), warned per read. */
  private[graft] def silenceBoundedWindowWarn(): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.datasources.DataSource",
      org.apache.logging.log4j.Level.ERROR)
  }

  /** Provenance strings in bench_best.json are the only NON-numeric
    * gate-keyed values ("prov":{"q_x":"<rev> <date> <mode>",…}); requiring
    * a quoted value keeps them disjoint from [[parseGateTimes]]. */
  private[graft] def parseProv(json: String): Map[String, String] =
    "\"(q[A-Za-z0-9_]*)\"\\s*:\\s*\"([^\"]*)\"".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2)).toMap

  /** Short git rev of the tree being measured — stamps every pin so a
    * carried minimum can be tied to the code that achieved it. */
  private lazy val gitRev: String =
    try {
      val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0 && out.nonEmpty && !out.contains(" ")) out
      else "unknown"
    } catch { case _: Throwable => "unknown" }

  private def provStamp(mode: String): String =
    s"$gitRev ${java.time.LocalDate.now(java.time.ZoneOffset.UTC)} $mode"

  private def readFile(p: java.nio.file.Path): Option[String] =
    if (java.nio.file.Files.isReadable(p))
      scala.util.Try(new String(java.nio.file.Files.readAllBytes(p), "UTF-8")).toOption
    else None

  private def queriesJson(qs: Seq[(String, Double)]): String =
    qs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  private def writeFile(p: java.nio.file.Path, s: String): Unit =
    scala.util.Try(java.nio.file.Files.write(p, (s + "\n").getBytes("UTF-8")))
      .failed.foreach(e => Console.err.println(s"[bench] could not write $p: ${e.getMessage}"))

  /** Merge fresh per-gate times into bench_best.json as a per-gate MIN across
    * every run of this session (full runs and --repin children alike). The
    * min is the right statistic for a shared box: timing noise is strictly
    * additive, so the fastest observation of a gate is the closest to the
    * plan's true cost, and a file of per-gate minima is the stable artifact
    * cross-round comparisons should read instead of any single drifted run.
    * Guarded by sf: a local sf0.01 iteration must not pollute the sf0.1 pin,
    * so a mismatched sf skips the merge (loudly) rather than resetting it.
    *
    * Every pin carries PROVENANCE ("prov": gate → "<rev> <date> <mode>"),
    * stamped when the pin's value was achieved — a minimum inherited
    * across rounds is then attributable to the tree that set it instead of
    * silently laundering into the current tree's scorecard. Gates in
    * `replace` take the fresh value even when it is SLOWER than the old
    * pin: that is the regression-replacement path — the old minimum was
    * re-tested in isolation on the current tree and found unreachable, so
    * keeping it would hide the regression forever. */
  private def mergeBest(sfDir: String, fresh: Map[String, Double],
      mode: String, replace: Set[String] = Set.empty): Unit =
    mergeBestAt(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BEST", "bench_best.json")),
      sfDir, fresh, mode, replace)

  private[graft] def mergeBestAt(path: java.nio.file.Path, sfDir: String,
      fresh: Map[String, Double], mode: String,
      replace: Set[String]): Unit = {
    val existing = readFile(path)
    val existingSf = existing.flatMap(
      "\"sf\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(_)).map(_.group(1))
    if (existingSf.exists(_ != sfDir)) {
      Console.err.println(
        s"[bench] bench_best.json is pinned at sf=${existingSf.get}; run at $sfDir NOT merged")
      return
    }
    val old = existing.map(parseGateTimes).getOrElse(Map.empty)
    val oldProv = existing.map(parseProv).getOrElse(Map.empty)
    val stamp = provStamp(mode)
    // two kinds of poison must never become a "best": the failed-gate
    // sentinel (a crashed gate records FailedSentinel, not a time), and
    // gates that no longer exist in the registry (a rename would otherwise
    // leave its stale minimum in the file — and in the total — forever)
    val live = SparkEntry.queries.keySet
    val merged: Seq[(String, (Double, String))] =
      (old.keySet ++ fresh.keySet).filter(live).toSeq.sorted.flatMap { k =>
        val o = old.get(k).filter(_ < FailedSentinel)
        val f = fresh.get(k).filter(_ < FailedSentinel)
        val won: Option[(Double, String)] =
          if (replace(k) && f.isDefined) {
            o.filter(f.get > _).foreach(ov => Console.err.println(
              f"[bench] pin REPLACED: $k ${ov}%.3f s (${oldProv.getOrElse(k, "no prov")}) " +
                f"→ ${f.get}%.3f s — old pin unreachable on the current tree"))
            Some((f.get, stamp))
          } else (o, f) match {
            case (Some(ov), Some(fv)) =>
              if (fv < ov) Some((fv, stamp))
              else Some((ov, oldProv.getOrElse(k, "pre-provenance")))
            case (Some(ov), None) => Some((ov, oldProv.getOrElse(k, "pre-provenance")))
            case (None, Some(fv)) => Some((fv, stamp))
            case _ => None
          }
        won.map(k -> _)
      }
    val dropped = (old.keySet ++ fresh.keySet).filterNot(live)
    if (dropped.nonEmpty)
      Console.err.println(s"[bench] pruned stale gates from bench_best: ${dropped.toSeq.sorted.mkString(",")}")
    val total = merged.map(_._2._1).sum
    val provJson = merged.map { case (k, (_, p)) => "\"" + k + "\":\"" + p + "\"" }
      .mkString("{", ",", "}")
    writeFile(path,
      s"""{"metric":"best","value":$total,"unit":"sec","sf":"$sfDir","queries":${queriesJson(merged.map { case (k, (v, _)) => k -> v })},"prov":$provJson}""")
  }

  /** `--repin q_a,q_b[,…]`: re-measure the named gates, each in a FRESH child
    * JVM, and merge the results into bench_best.json. This is the isolated
    * re-pin methodology (PERFORMANCE.md): a gate timed in a long shared-JVM
    * run inherits GC/JIT/page-cache state from ~130 predecessors and can
    * read up to 10x slow; a child JVM that warms only its own tables and runs
    * only that gate is reproducible. Children run sequentially (never
    * concurrently — they'd contend for the same 32 cores and re-introduce the
    * noise this mode exists to remove). */
  /** Run ONE gate in a fresh child JVM with `repeats` repetitions and
    * return its min, or None when the child failed. The isolated-JVM
    * methodology (PERFORMANCE.md): a fresh process warms only its own
    * tables and inherits no GC/JIT/page-cache state. */
  private def repinOne(gate: String, repeats: Int): Option[Double] = {
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    val out = java.nio.file.Files.createTempFile(s"graft_repin_$gate", ".json")
    val cmd: Seq[String] =
      Seq(javaBin) ++ addOpens ++ Seq(
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_ONLY", gate)
    pb.environment().put("SPARK_GRAFT_REPEATS", repeats.toString)
    pb.environment().put("SPARK_GRAFT_BENCH_OUT", out.toString)
    // the child would merge bench_best itself; suppress that so the parent
    // is the single writer (keeps this loop safe to Ctrl-C mid-gate)
    pb.environment().put("SPARK_GRAFT_NO_BEST", "1")
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    val rc = pb.start().waitFor()
    // a gate that THREW in the child still exits 0 — it records the
    // FailedSentinel instead of a time, which must read as a failure
    // here, not as a (huge) measurement to launder into bench_best
    val t = readFile(out).map(parseGateTimes).getOrElse(Map.empty)
      .get(gate).filter(_ < FailedSentinel)
    java.nio.file.Files.deleteIfExists(out)
    if (rc != 0 || t.isEmpty)
      Console.err.println(s"[bench] repin of $gate FAILED (rc=$rc)")
    t
  }

  /** Reps for an isolated repin child: 8 by default (the drift
    * adjudication standard — one slow window cannot survive eight
    * isolated attempts). */
  private def repinRepeats: Int =
    sys.env.getOrElse("SPARK_GRAFT_REPIN_REPEATS", "8").toInt.max(1)

  /** Current pins, trusted only when recorded at this sf. */
  private def loadPins(sfDir: String): Map[String, Double] = {
    val f = readFile(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BEST", "bench_best.json")))
    val sfOk = f.flatMap(
      "\"sf\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(_)).map(_.group(1))
      .contains(sfDir)
    if (sfOk) f.map(parseGateTimes).getOrElse(Map.empty) else Map.empty
  }

  /** The pin-adjudication rule, shared by `--repin` and the automatic
    * drift repin: an isolated min within 1.3x of the pin RE-ACHIEVES it
    * (the pin stands, and a faster observation improves it); beyond 1.3x
    * the pin is unreachable on this tree and gets REPLACED — the
    * regression becomes the pin, named on stderr, instead of hiding
    * behind a minimum some earlier tree set. */
  private[graft] def replaceSet(pins: Map[String, Double],
      isolated: Seq[(String, Double)]): Set[String] =
    isolated.collect {
      case (g, t) if pins.get(g).exists(p => t > 1.3 * p) => g
    }.toSet

  private def repin(gateCsv: String): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val gates = gateCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val results = gates.map(g => g -> repinOne(g, repinRepeats))
    val ok = results.collect { case (g, Some(t)) => g -> t }
    mergeBest(sfDir, ok.toMap, mode = "repin",
      replace = replaceSet(loadPins(sfDir), ok))
    println(s"""{"metric":"repin","unit":"sec","queries":${queriesJson(ok)}}""")
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 2 && args(0) == "--repin") { repin(args(1)); return }
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
    silenceBoundedWindowWarn()
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
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
      }
      if (ok) (System.nanoTime() - t0) / 1e9 else FailedSentinel
    }
    // the session-best pins, for the ambient-outlier re-measure below —
    // only trusted when recorded at this very sf
    val bestPins: Map[String, Double] = loadPins(sfDir)
    val results: Seq[(String, Seq[Double])] = selected.map { case (name, fn) =>
      val first = (1 to repeats).map(_ => timeOnce(name, fn))
      // NOISE-ROBUST re-measure: a gate whose min-of-N still reads >3x its
      // session-best pin on byte-identical code is overwhelmingly an
      // ambient stall (GC/IO/CPU contention — noise is strictly additive),
      // not a regression; give it extra reps so one slow window can't
      // masquerade as a 10x regression in the round's official number. A
      // REAL regression survives every rep and still reports slow.
      val extra = bestPins.get(name) match {
        case Some(b) if first.min < FailedSentinel && first.min > 3 * b =>
          Console.err.println(
            f"[bench] $name min ${first.min}%.3f s > 3x best pin $b%.3f s — re-measuring")
          (1 to 2).map(_ => timeOnce(name, fn))
        case _ => Nil
      }
      name -> (first ++ extra)
    }
    val mins = results.map { case (n, ts) => n -> ts.min }
    val total = if (mins.nonEmpty) mins.map(_._2).sum else 0.0
    // DRIFT ADJUDICATION (runs only in a full, best-merging run — never in
    // a --repin child): any gate whose in-suite min reads >1.5x a CARRIED
    // pin gets a forced isolated 8-rep re-measure on THIS tree, in a fresh
    // child JVM. Within 1.3x of the pin → ambient noise, pin re-achieved
    // (and the isolated min merges normally). Beyond 1.3x → the pin is
    // unreachable on the current tree: it is REPLACED and the regression
    // named — a minimum inherited from an older tree can no longer declare
    // the current tree healthy. Capped (loudly) so a machine-wide stall
    // can't turn one bench run into 100 child JVMs.
    val autoRepin = !sys.env.contains("SPARK_GRAFT_ONLY") &&
      !sys.env.contains("SPARK_GRAFT_NO_BEST") &&
      !sys.env.contains("SPARK_GRAFT_NO_REPIN")
    val driftCap = sys.env.getOrElse("SPARK_GRAFT_REPIN_MAX", "16").toInt
    val drifted: Seq[(String, Double)] =
      if (!autoRepin) Nil
      else mins.filter { case (n, t) =>
        t < FailedSentinel && bestPins.get(n).exists(p => t > 1.5 * p)
      }.sortBy { case (n, t) => -(t / bestPins(n)) }
    if (drifted.size > driftCap)
      Console.err.println(s"[bench] ${drifted.size} gates drifted >1.5x " +
        s"pin; repinning the worst $driftCap, SKIPPING: " +
        drifted.drop(driftCap).map(_._1).mkString(","))
    val isolated: Seq[(String, Double)] = drifted.take(driftCap).flatMap {
      case (n, t) =>
        Console.err.println(
          f"[bench] $n in-suite min $t%.3f s > 1.5x pin ${bestPins(n)}%.3f s " +
            "— forcing an isolated repin on this tree")
        repinOne(n, repinRepeats).map(n -> _)
    }
    val replaced = replaceSet(bestPins, isolated)
    isolated.foreach { case (n, t) =>
      val p = bestPins(n)
      if (replaced(n))
        Console.err.println(f"[bench] REGRESSION $n: pin $p%.3f s unreachable " +
          f"(isolated 8-rep min $t%.3f s, ${t / p}%.2fx) — pin replaced")
      else
        Console.err.println(f"[bench] $n pin $p%.3f s re-achieved in isolation " +
          f"($t%.3f s, ${t / p}%.2fx) — in-suite drift was ambient")
    }
    // per-rep evidence rides the DETAIL file: an outlier is then visible AS
    // an outlier (one slow rep among fast ones) instead of a regression;
    // repin outcomes ride along so the round artifact carries the
    // adjudication, not just this process's stderr
    val repsJson = results.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val repinJson = isolated.map { case (n, t) =>
      val outcome = if (replaced(n)) "replaced" else "held"
      "\"" + n + "\":{\"pin\":" + bestPins(n) + ",\"suite\":" +
        mins.toMap.apply(n) + ",\"isolated\":" + t +
        ",\"outcome\":\"" + outcome + "\"}"
    }.mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":${queriesJson(mins)},"reps":$repsJson,"repin":$repinJson,"sf":"$sfDir","rev":"$gitRev"}"""
    // Per-gate detail (~130 keys, ~4 KB) goes to the FILE; stdout gets a
    // SHORT contract line. The driver captures a tail-limited window of
    // stdout, and three rounds of BENCH_rN.json came back "parsed": null
    // because the 4 KB full line was cut mid-key. Totals plus the top-8
    // slowest gates stays well under any plausible capture window while
    // keeping the line's shape (metric/value/unit/queries/sf) intact.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json"))
    writeFile(out, full)
    // isolated repin minima are real current-tree observations: they merge
    // alongside the in-suite minima (per gate the lower wins), and the
    // replaced set forces unreachable pins to yield
    if (!sys.env.contains("SPARK_GRAFT_NO_BEST"))
      mergeBest(sfDir, mins.toMap ++ isolated.filter { case (n, t) =>
        t < mins.toMap.getOrElse(n, Double.MaxValue) },
        mode = "full", replace = replaced)
    val top = mins.sortBy(-_._2).take(8)
    // stop Spark BEFORE the contract line so nothing (shutdown hooks, a
    // late executor WARN) can land after it: it must be the final stdout
    // line of the run, bare (build.sbt routes forked stdout past sbt's
    // logger, so no "[info] " prefix corrupts the driver's parse)
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","gates":${mins.size},"queries":${queriesJson(top)},"sf":"$sfDir","detail":"$out"}""")
  }
}
