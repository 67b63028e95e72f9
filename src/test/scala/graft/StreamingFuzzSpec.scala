package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.{DataLayout, MatView}
import graft.streaming.StreamingDiff

/** Model-based STREAMING fuzz: a seeded walk of CDC micro-batches through
  * the IVM sink body (merge + view refresh), with at-least-once chaos
  * injected — replayed batch ids and merge-then-crash gaps — and exact
  * model equality (layout) plus full-recompute equality (view) after
  * every trigger. The streaming counterpart of LayoutFuzzSpec.
  */
class StreamingFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("15 chaotic CDC triggers: layout == model, view == recompute, replays no-op") {
    val root = Files.createTempDirectory("graft_sfuzz").toString
    val dir = root + "/t"
    val viewDir = root + "/v"
    val dims = Seq(col("k"))
    val rnd = new scala.util.Random(815L)
    var model = Map.empty[Long, (String, Long)] // k -> (grp, amt)
    var nextKey = 0L

    def cdcDf(rows: Seq[(Long, String, Long, String, Long)]) =
      rows.toDF("k", "grp", "amt", "op", "seq")

    def ivm(batch: Seq[(Long, String, Long, String, Long)], id: Long): Unit =
      StreamingDiff.ivmBatch(cdcDf(batch), id, dims, 16, Seq("k"), dir,
        Seq("k"), "op", "seq", viewDir, Seq("grp"), Seq("amt"), 2)

    def mergeOnly(batch: Seq[(Long, String, Long, String, Long)], id: Long): Unit =
      StreamingDiff.cdcMergeBatch(cdcDf(batch), id, dims, 16, Seq("k"), dir,
        Seq("k"), "op", "seq", 2)

    def layoutNow(): Map[Long, (String, Long)] =
      if (DataLayout.currentVersion(spark, dir) < 0L) Map.empty
      else DataLayout.readLayout(spark, dir)
        .select("k", "grp", "amt").as[(Long, String, Long)]
        .collect().map(t => t._1 -> ((t._2, t._3))).toMap

    def viewNow(): Map[String, (Long, Long, Long, Long)] =
      MatView.read(spark, viewDir)
        .select("grp", "n_rows", "sum_amt", "min_amt", "max_amt")
        .as[(String, Long, Long, Long, Long)]
        .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap

    def recompute(): Map[String, (Long, Long, Long, Long)] =
      model.toSeq.map { case (_, (g, a)) => (g, a) }
        .groupBy(_._1).map { case (g, rows) =>
          val amts = rows.map(_._2)
          g -> ((amts.size.toLong, amts.sum, amts.min, amts.max))
        }

    def randomBatch(seqBase: Long): Seq[(Long, String, Long, String, Long)] = {
      val keys = model.keys.toIndexedSeq
      val inserts = (0 until (10 + rnd.nextInt(40))).map { i =>
        (nextKey + i, s"g${rnd.nextInt(6)}", rnd.nextLong(100000L), "I", seqBase)
      }
      nextKey += 100
      val updates = rnd.shuffle(keys).take(rnd.nextInt(20)).map { k =>
        (k, s"g${rnd.nextInt(6)}", rnd.nextLong(100000L), "U", seqBase)
      }
      val deletes = rnd.shuffle(keys).take(rnd.nextInt(15)).map { k =>
        (k, "", 0L, "D", seqBase)
      }
      // multi-event keys: an update then a delete at a later seq — the
      // delete must win; and the reverse on another key — the update wins
      val contested = rnd.shuffle(keys).take(2) match {
        case Seq(k1, k2) => Seq(
          (k1, "gX", 1L, "U", seqBase), (k1, "", 0L, "D", seqBase + 1),
          (k2, "", 0L, "D", seqBase), (k2, "gY", 2L, "U", seqBase + 1))
        case _ => Nil
      }
      rnd.shuffle(inserts ++ updates ++ deletes ++ contested)
    }

    def applyToModel(batch: Seq[(Long, String, Long, String, Long)]): Unit = {
      // last-event-wins per key by seq (ties: the sink's window is ordered
      // by seq desc only, so the fuzz never emits same-key same-seq pairs)
      val winners = batch.groupBy(_._1).map { case (_, evs) => evs.maxBy(_._5) }
      winners.foreach {
        case (k, _, _, "D", _) => model -= k
        case (k, g, a, _, _) => model += k -> ((g, a))
      }
    }

    var lastBatch: Seq[(Long, String, Long, String, Long)] = Nil
    for (id <- 0L until 15L) {
      val batch = randomBatch(seqBase = id * 10)
      rnd.nextInt(4) match {
        case 0 if id > 0 =>
          // chaos 1: replay the PREVIOUS id with different content first —
          // the commit marker must make it a pure no-op
          ivm(lastBatch.map { case (k, g, a, o, s) => (k, "POISON", a, o, s) },
            id - 1)
          ivm(batch, id)
        case 1 =>
          // chaos 2: crash between merge and refresh — the merge lands,
          // the view lags one version until the NEXT trigger heals it
          mergeOnly(batch, id)
          ivm(Nil.toSeq ++ batch, id) // retry of the same trigger id: merge
          // no-ops via its marker, refresh rolls the gap forward
        case _ =>
          ivm(batch, id)
      }
      applyToModel(batch)
      lastBatch = batch
      assert(layoutNow() == model, s"trigger $id: layout diverged")
      assert(viewNow() == recompute(), s"trigger $id: view diverged")
    }
    assert(model.nonEmpty && recompute().nonEmpty)
  }
}
