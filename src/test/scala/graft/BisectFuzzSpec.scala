package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

/** Randomized EQUIVALENCE fuzz for the r18 bisection paths: for seeded
  * random (clustering, key shape, mutation mix, recursion threshold), the
  * bisected diff must return row-for-row what the same differ returns
  * with bisection DISABLED (`bisectSegments = 0` — the plain full-set
  * JoinDiff over the unmatched files, the ground-truth path). Covers
  * single-key and compound-key meshing, recursion depths forced by tiny
  * thresholds, deletes/updates/inserts in one diff, and both clean and
  * dirty null-key-free tables (null-pool semantics are pinned separately
  * in LayoutDiff2Spec — the checksum contract differs from the JoinDiff's
  * unmatchable-null-PK contract by design). */
class BisectFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("bisected diff ≡ plain diff across random clusterings, keys, mutations") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919)
      val n = 3000 + rnd.nextInt(12000)
      val root = Files.createTempDirectory(s"graft_bfz$seed").toString
      def mk(extra: Int) = spark.range(0, n + extra).select(
        col("id"),
        concat(lit("g"), pmod(col("id"), lit(2 + rnd.nextInt(6)))).as("grp"),
        (col("id") * 13 % 65536).as("x"),
        (col("id") * 31 % 997).as("y"))
      val dimsPool = Seq(Seq(col("x")), Seq(col("id")), Seq(col("y"), col("x")))
      val keyShape = rnd.nextInt(3) // 0: id; 1: (grp, id) mesh; 2: (id, x)
      val keys = keyShape match {
        case 0 => Seq("id")
        case 1 => Seq("grp", "id")
        case _ => Seq("id", "x")
      }
      val stats = (keys ++ Seq("x")).distinct
      DataLayout.writeZOrdered(mk(0), dimsPool(rnd.nextInt(3)), 16, stats,
        s"$root/a", 4 + rnd.nextInt(8))
      // b: same logical table under a DIFFERENT clustering, then mutate
      var b = mk(rnd.nextInt(3)) // 0-2 extra inserted ids
      val delLo = rnd.nextInt(n - 500)
      val delHi = delLo + rnd.nextInt(400)
      if (rnd.nextBoolean()) b = b.where(!col("id").between(delLo, delHi))
      val updLo = rnd.nextInt(n - 500)
      val updHi = updLo + rnd.nextInt(200)
      if (rnd.nextBoolean()) b = b.withColumn("y",
        when(col("id").between(updLo, updHi), -col("y")).otherwise(col("y")))
      DataLayout.writeZOrdered(b, dimsPool(rnd.nextInt(3)), 16, stats,
        s"$root/b", 4 + rnd.nextInt(8))
      val threshold = Seq(16L, 512L, 1L << 16)(rnd.nextInt(3))
      val bis = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
        keys, Seq("y"), bisectRowThreshold = threshold)
      val plain = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
        keys, Seq("y"), bisectSegments = 0)
      def rows(d: org.apache.spark.sql.DataFrame): Seq[String] =
        d.select((col("sign") +: (keys :+ "y").map(col)): _*)
          .collect().map(_.toString).sorted.toSeq
      val got = rows(bis.df)
      val want = rows(plain.df)
      assert(got == want,
        s"seed=$seed keys=$keys threshold=$threshold " +
          s"bis=$bis got=${got.take(5)} want=${want.take(5)}")
      // when anything differed, bisection must actually have engaged and
      // confined the row diff (files, not just rows)
      if (want.nonEmpty) {
        assert(bis.filesRowDiffedA >= 0, s"seed=$seed did not engage: $bis")
        assert(bis.bisectLevels >= 1, bis.toString)
      }
    }
  }
}
