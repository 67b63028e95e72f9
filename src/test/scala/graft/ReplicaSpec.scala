package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.{DataLayout, Replica}

/** CDC replication: after any mutation mix on the source, one sync must
  * land the replica on exactly the source's current rows — at churn cost,
  * with last-event-wins collapsing of multi-step key histories. */
class ReplicaSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_replica_spec").toString

  private def rows(dir: String): Set[(Long, Long, Long)] =
    DataLayout.readLayout(spark, dir).select("id", "g", "m")
      .as[(Long, Long, Long)].collect().toSet

  test("sync lands the replica on the source rows across append/update/delete") {
    val root = tmp(); val src = s"$root/src"; val dst = s"$root/dst"
    val base = (0 until 3000).map(i => (i.toLong, (i % 10).toLong, i * 3L))
      .toDF("id", "g", "m")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), src, 6)
    // replica clustered by ITS OWN dims (g first) — they need not match
    Replica.init(spark, src, dst, Seq(col("g"), col("id")), 16,
      Seq("id", "g"), Seq("id"), numFiles = 4)
    assert(rows(dst) == rows(src))

    // source churn: append, DV delete, update-via-merge, delete-via-merge
    DataLayout.appendZOrdered(
      (5000 until 5500).map(i => (i.toLong, (i % 10).toLong, i * 7L))
        .toDF("id", "g", "m"), Seq(col("id")), 16, Seq("id"), src, 2)    // v1
    DataLayout.deleteVectors(spark, src, Seq(("id", 200L, 450L)))        // v2
    DataLayout.mergeInto(spark, src, Seq(col("id")), 16, Seq("id"),
      (1000 until 1080).map(i => (i.toLong, 3L, -1L)).toDF("id", "g", "m"),
      Seq("id"), numFiles = 1,
      deleteKeys = Some((2000L until 2050L).toDF("id")))                 // v3

    val rep = Replica.sync(spark, dst, Seq(col("g"), col("id")), 16,
      Seq("id", "g"), numFiles = 2)
    assert(rows(dst) == rows(src))
    assert(rep.fromVersion == 0L && rep.toVersion == 3L)
    // churn, not table size: 500 + 251 + 160 + 50 = 961 feed rows
    assert(rep.feedRows == 961L, rep.toString)
    assert(rep.upserts == 580L && rep.deletes == 301L, rep.toString)
    // (file-envelope pruning is pinned in mergeInto's own spec; with
    // g-first clustering here every file's id-envelope spans the domain,
    // so the merge legitimately rewrites them all)
    assert(rep.filesRewritten > 0)

    // idempotent: second sync is a no-op
    val noop = Replica.sync(spark, dst, Seq(col("g"), col("id")), 16,
      Seq("id", "g"), numFiles = 2)
    assert(noop.feedRows == 0L && noop.upserts == 0L && noop.deletes == 0L)
    assert(rows(dst) == rows(src))

    // VERIFY: the clean, synced replica proves equal to its source with
    // zero row-diff work — despite different clustering AND outstanding
    // soft deletes on the source (the DV'd files re-fingerprint at
    // DV-cost; everything else cancels additively from the manifests)
    val clean = Replica.verify(spark, dst)
    assert(clean.df.isEmpty)
    assert(clean.filesReadA == 0 && clean.filesReadB == 0, clean.toString)

    // drift detection: out-of-band source churn surfaces as exact rows —
    // deleted on the source, so now present only in the replica: '+'
    DataLayout.deleteVectors(spark, src, Seq(("id", 600L, 610L)))
    val drift = Replica.verify(spark, dst)
    val driftRows = drift.df.select("sign", "id")
      .as[(String, Long)].collect().toSet
    assert(driftRows == (600L to 610L).map(i => ("+", i)).toSet)
    // and one sync repairs it, after which verify is clean again
    Replica.sync(spark, dst, Seq(col("g"), col("id")), 16,
      Seq("id", "g"), numFiles = 2)
    assert(Replica.verify(spark, dst).df.isEmpty)
  }

  test("last event wins: updated-five-times applies once; delete-then-reinsert survives") {
    val root = tmp(); val src = s"$root/src"; val dst = s"$root/dst"
    val base = (0 until 100).map(i => (i.toLong, 0L, i.toLong)).toDF("id", "g", "m")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), src, 1)
    Replica.init(spark, src, dst, Seq(col("id")), 16, Seq("id"),
      Seq("id"), numFiles = 1)
    // five successive updates of id=7
    for (k <- 1 to 5)
      DataLayout.mergeInto(spark, src, Seq(col("id")), 16, Seq("id"),
        Seq((7L, 0L, 1000L + k)).toDF("id", "g", "m"), Seq("id"), 1)
    // delete id=9 ... then re-insert it with a new payload
    DataLayout.mergeInto(spark, src, Seq(col("id")), 16, Seq("id"),
      base.where(lit(false)), Seq("id"), 1, deleteKeys = Some(Seq(9L).toDF("id")))
    DataLayout.mergeInto(spark, src, Seq(col("id")), 16, Seq("id"),
      Seq((9L, 0L, 777L)).toDF("id", "g", "m"), Seq("id"), 1)
    // and delete id=11 for good
    DataLayout.mergeInto(spark, src, Seq(col("id")), 16, Seq("id"),
      base.where(lit(false)), Seq("id"), 1, deleteKeys = Some(Seq(11L).toDF("id")))

    val rep = Replica.sync(spark, dst, Seq(col("id")), 16, Seq("id"), 1)
    assert(rows(dst) == rows(src))
    // the collapse: 3 net key changes (7 upd, 9 reinserted, 11 deleted)
    assert(rep.upserts == 2L && rep.deletes == 1L, rep.toString)
    val m = rows(dst).map(t => t._1 -> t._3).toMap
    assert(m(7L) == 1005L && m(9L) == 777L && !m.contains(11L))
  }

  test("sync refuses a regressed source; init refuses a bad stats contract") {
    val root = tmp(); val src = s"$root/src"; val dst = s"$root/dst"
    val base = (0 until 50).map(i => (i.toLong, 0L, i.toLong)).toDF("id", "g", "m")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), src, 1)
    intercept[IllegalArgumentException] { // stats must cover the merge key
      Replica.init(spark, src, dst, Seq(col("g")), 16, Seq("g"),
        Seq("id"), numFiles = 1)
    }
    DataLayout.deleteVectors(spark, src, Seq(("id", 0L, 5L))) // src at v1
    Replica.init(spark, src, dst, Seq(col("id")), 16, Seq("id"),
      Seq("id"), numFiles = 1)                                // pinned at 1
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), src, 1)
    intercept[IllegalArgumentException] { // source version regressed to 0
      Replica.sync(spark, dst, Seq(col("id")), 16, Seq("id"), 1)
    }
  }
}
