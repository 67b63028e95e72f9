package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB attribution probe for any declared gate: runs the gate with a
  * listener recording every Spark job's wall time and call site, then
  * prints the jobs in order plus a by-call-site rollup. This is how a
  * layout gate's fixed per-commit job costs (manifest aggs, schema-log
  * heads, stats read-backs, log-commit writes) get NAMED instead of
  * eyeballed from suite minima. Run:
  * `runMain graft.GateProbe q_layout_maintain [sfDir]`. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GateProbe <gate> [sfDir]")
    val gate = args(0)
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_PROBE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.silenceBoundedWindowWarn()
    val fn = SparkEntry.queries.getOrElse(gate,
      throw new IllegalArgumentException(s"unknown gate $gate"))
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"))
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }

    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val execStart = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val execSpans = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    val listener = new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(s.executionId, s.description)
            execStart.put(s.executionId, System.nanoTime())
          case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
            Option(execStart.remove(e.executionId)).foreach { t0 =>
              execSpans.add((execDesc.getOrDefault(e.executionId, "?"),
                (System.nanoTime() - t0) / 1e9))
            }
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val viaExec = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(execDesc.get(id.toLong)))
        val site = viaExec
          .orElse(js.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        jobs.put(js.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (site, t0) =>
          done.add((je.jobId, site, (System.nanoTime() - t0) / 1e9))
        }
      }
    }

    // DRIVER-SIDE wall attribution: jobs + SQL spans explain only part of a
    // layout gate's wall (the rest is driver work — log decode, footer
    // reads, renames, planning). A 5 ms sampler over the gate thread names
    // it: rollup by the deepest repo frame (graft.*), falling back to the
    // top spark/hadoop/parquet frame.
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val gateThread = Thread.currentThread()
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = gateThread.getStackTrace
          val frame = st.find(e => e.getClassName.startsWith("graft."))
            .orElse(st.headOption)
            .map(e => s"${e.getClassName.replaceAll("^.*graft", "graft")}.${e.getMethodName}:${e.getLineNumber}")
            .getOrElse("?")
          samples.merge(frame, 1, (a, b) => a + b)
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    for (rep <- 1 to reps) {
      done.clear(); execSpans.clear(); samples.clear()
      if (rep == reps) { spark.sparkContext.addSparkListener(listener); sampling = true }
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
      println(f"[gateprobe] $gate rep $rep wall $wall%.3f s")
      if (rep == reps) {
        Thread.sleep(500) // let the listener bus drain
        spark.sparkContext.removeSparkListener(listener)
        import scala.jdk.CollectionConverters._
        val rows = done.asScala.toSeq.sortBy(_._1)
        println(s"[gateprobe] ${rows.size} jobs, " +
          f"sum ${rows.map(_._3).sum}%.3f s (wall $wall%.3f s)")
        rows.foreach { case (id, site, s) =>
          println(f"[gateprobe]   job $id%4d $s%7.3f s  $site")
        }
        println("[gateprobe] rollup by call site:")
        rows.groupBy(_._2).toSeq
          .map { case (site, g) => (g.map(_._3).sum, g.size, site) }
          .sortBy(-_._1)
          .foreach { case (s, n, site) =>
            println(f"[gateprobe]   $s%7.3f s  n=$n%-3d $site")
          }
        import scala.jdk.CollectionConverters._
        val spans = execSpans.asScala.toSeq
        println(f"[gateprobe] ${spans.size} sql executions, " +
          f"span sum ${spans.map(_._2).sum}%.3f s — rollup:")
        spans.groupBy(_._1).toSeq
          .map { case (d, g) => (g.map(_._2).sum, g.size, d) }
          .sortBy(-_._1).take(20)
          .foreach { case (s, n, d) =>
            println(f"[gateprobe]   $s%7.3f s  n=$n%-3d $d")
          }
        val sm = samples.entrySet().asScala.toSeq
          .map(e => (e.getValue.toInt, e.getKey)).sortBy(-_._1)
        val tot = sm.map(_._1).sum.max(1)
        println(f"[gateprobe] driver-thread samples (5 ms): $tot (~${tot * 0.005}%.2f s) — top frames:")
        sm.take(30).foreach { case (n, f) =>
          println(f"[gateprobe]   ${n * 0.005}%7.2f s  ${n * 100.0 / tot}%5.1f%%  $f")
        }
      }
    }
    spark.stop()
  }
}
