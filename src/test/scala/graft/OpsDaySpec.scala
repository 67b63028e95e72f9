package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cli.LayoutCli
import graft.layout.DataLayout

/** The CAPSTONE integration: a full operational day, spelled entirely in
  * ops-CLI commands — the composition every piece of the layout layer
  * exists to make work together. Producers drop parquet files in a
  * landing dir; `ingest --once` drains them exactly-once into a clustered
  * table; soft deletes arrive; `maintain` pays the debt down; a replica
  * on different clustering inits, follows through more churn via `sync`,
  * and `verify` proves it clean from metadata alone. No Scala API call
  * touches the data path.
  */
class OpsDaySpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def cli(args: String*): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      LayoutCli.run(LayoutCli.parseArgs(args.toArray), spark)
    }
    bos.toString("UTF-8")
  }

  test("a full ops day through the CLI: ingest, delete, maintain, replicate, verify") {
    val root = Files.createTempDirectory("graft_opsday").toString
    val landing = root + "/landing"
    val table = root + "/events"
    val replica = root + "/replica"
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def land(ids: Range): Unit = {
      val tmp = Files.createTempDirectory("graft_opsland").toString
      ids.map(i => (i.toLong, (i * 131L) % 10000L, (i * 7L) % 100L))
        .toDF("event_id", "user_id", "amount")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      fsys.mkdirs(new org.apache.hadoop.fs.Path(landing))
      for (f <- new java.io.File(tmp).listFiles
           if f.getName.endsWith(".parquet"))
        fsys.rename(new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          new org.apache.hadoop.fs.Path(s"$landing/${f.getName}"))
    }

    // morning: three producer drops, one drain each (restart-safe)
    for (b <- 0 until 3) {
      land(b * 1000 until b * 1000 + 800)
      cli("ingest", table, "--from", landing, "--dims", "user_id",
        "--stats", "event_id,user_id,amount", "--files", "2", "--once")
    }
    assert(DataLayout.readLayout(spark, table).count() == 2400L)

    // midday: a right-to-be-forgotten request (soft delete, instant)
    assert(cli("delete", table, "--range", "user_id:100:199", "--soft")
      .contains("delete-soft"))
    val afterDelete = DataLayout.readLayout(spark, table).count()
    assert(afterDelete < 2400L)

    // afternoon: the replica comes up on ITS OWN clustering and is clean
    cli("replica-init", replica, "--from", table, "--dims", "amount,user_id",
      "--stats", "event_id,user_id,amount", "--keys", "event_id", "--files", "2")
    assert(cli("verify", replica).contains(""""clean":true"""))

    // evening: nightly maintenance pays every debt (the DV purge, the
    // drains' small files) and bloom hygiene would ride if indexed
    val m = cli("maintain", table, "--dims", "user_id",
      "--stats", "event_id,user_id,amount", "--rows-per-file", "2000",
      "--retain", "2")
    assert(m.contains(""""purged":true"""))
    assert(DataLayout.readLayout(spark, table).count() == afterDelete)

    // night: more events land + drain; the replica follows and proves it
    land(9000 until 9500)
    cli("ingest", table, "--from", landing, "--dims", "user_id",
      "--stats", "event_id,user_id,amount", "--files", "2", "--once")
    val s = cli("replica-sync", replica, "--dims", "amount,user_id",
      "--stats", "event_id,user_id,amount", "--files", "2")
    assert(s.contains(""""upserts":500"""))
    val v = cli("verify", replica)
    assert(v.contains(""""clean":true"""))
    // the clean verify cost ZERO data-file reads on the source side —
    // different clustering notwithstanding (additive fingerprints)
    assert(v.contains(""""files_read_src":0"""))
    assert(DataLayout.readLayout(spark, replica).count() == afterDelete + 500L)
  }
}
