package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("milliLog2 is exact at powers of two and monotone between them") {
    val xs = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 1000L, 1024L, (1L << 40))
    val got = xs.toDF("x").select(TextFunctions.milliLog2(col("x")).as("l"))
      .as[Long].collect().toSeq
    val byX = xs.zip(got).toMap
    assert(byX(1L) == 0L && byX(2L) == 1000L && byX(4L) == 2000L &&
      byX(8L) == 3000L && byX(1024L) == 10000L && byX(1L << 40) == 40000L)
    // piecewise-linear interior points: L(3) = 1500, L(5) = 2250, L(7) = 2750
    assert(byX(3L) == 1500L && byX(5L) == 2250L && byX(7L) == 2750L)
    // within 86 milli-bits of the float answer everywhere sampled
    xs.foreach { x =>
      val err = math.abs(byX(x) - math.round(1000 * math.log(x.toDouble) / math.log(2)))
      assert(err <= 86, s"milliLog2($x) off by $err millibits")
    }
    // monotone
    assert(got.sorted == got)
  }

  test("DSIR weights rank target-like documents above corpus-generic ones") {
    // target = src1/src2 talk about alpha/beta; the rest about gamma/delta
    val docs = (0L until 40L).map { i =>
      val (src, txt) =
        if (i < 10) (s"src${1 + (i % 2)}", "alpha beta alpha beta quality prose")
        else (s"src${3 + (i % 4)}", "gamma delta gamma delta generic filler")
      (i, txt, "en", src, txt.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = graft.operators.CurationQueries.queries("q_dsir_weights")(spark, dir)
      .select("doc_id", "weight_millibits", "selected")
      .as[(Long, Long, Boolean)].collect().toSeq
    val (tgt, rest) = w.partition(_._1 < 10)
    // every target-domain doc outweighs every generic doc, and the
    // selected flag is exactly the positive-weight set
    assert(tgt.map(_._2).min > rest.map(_._2).max)
    w.foreach { case (_, wt, sel) => assert(sel == (wt > 0)) }
    assert(tgt.forall(_._3), "target-domain docs must be selected")
  }
}
