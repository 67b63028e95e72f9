package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  /** Reference Morton interleave in plain Scala — the independent oracle
    * the Column fold must match bit for bit. */
  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    val k = vals.size
    var z = 0L
    for ((v, ci) <- vals.zipWithIndex; j <- 0 until bits)
      z |= ((v >> j) & 1L) << (j * k + (k - 1 - ci))
    z
  }

  test("zOrderKey matches the reference interleave on random 2-D points") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextLong(1 << 20), rnd.nextLong(1 << 20)))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        DataLayout.zOrderKey(Seq(col("x"), col("y")), 20).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == mortonRef(Seq(x, y), 20)) }
  }

  test("zOrderKey interleaves three dimensions and known corners") {
    // x=1,y=0,z=0 @1 bit: x owns the most-significant bit of the group
    val one = Seq((1L, 0L, 0L)).toDF("a", "b", "c")
      .select(DataLayout.zOrderKey(Seq(col("a"), col("b"), col("c")), 1))
      .head().getLong(0)
    assert(one == 4L)
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(100)((rnd.nextLong(1 << 10), rnd.nextLong(1 << 10), rnd.nextLong(1 << 10)))
    val got = pts.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        DataLayout.zOrderKey(Seq(col("a"), col("b"), col("c")), 10).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, c, z) => assert(z == mortonRef(Seq(a, b, c), 10)) }
  }

  test("zOrderKey rejects bit widths that overflow a signed long") {
    intercept[IllegalArgumentException] {
      DataLayout.zOrderKey(Seq(col("x"), col("y")), 32)
    }
    intercept[IllegalArgumentException] { DataLayout.zOrderKey(Seq.empty, 8) }
  }

  test("linearBucket is the exact integer rescale, clamped at the edges") {
    val got = Seq(-5L, 0L, 1L, 499L, 500L, 999L, 1500L).toDF("v")
      .select(DataLayout.linearBucket(col("v"), 0L, 999L, 4).as("b"))
      .as[Long].collect().toSeq
    // ((clamp(v) - 0) * 16) div 1000
    assert(got == Seq(0L, 0L, 0L, 7L, 8L, 15L, 15L))
  }

  private def writeSample(dir: String, n: Int = 4000, files: Int = 8): Unit = {
    val rnd = new scala.util.Random(1234)
    val df = (0 until n).map { i =>
      (i.toLong, rnd.nextLong(1 << 16), rnd.nextLong(1 << 16))
    }.toDF("id", "x", "y")
    DataLayout.writeZOrdered(df, Seq(col("x"), col("y")), bits = 16,
      statsCols = Seq("x", "y"), outDir = dir, numFiles = files)
  }

  test("writeZOrdered: plain reads see all rows and never the manifest") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir)
    // underscore-prefixed manifest dir is hidden from the file index
    assert(spark.read.parquet(dir).count() == 4000L)
    val manifest = spark.read.parquet(s"$dir/${DataLayout.ManifestDir}")
    assert(manifest.count() == 8L)
    assert(manifest.columns.toSet ==
      Set("file", "min_x", "max_x", "nulls_x", "hll_x",
        "min_y", "max_y", "nulls_y", "hll_y", "zmin", "zmax", "n_rows",
        "content_fp", "v_added", "v_removed"))
    assert(DataLayout.currentVersion(spark, dir) == 0L)
  }

  test("skipScan returns exactly the filtered rows and prunes files") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir)
    val full = spark.read.parquet(dir)
    for ((xlo, xhi, ylo, yhi) <- Seq(
        (0L, 8191L, 0L, 8191L),         // small corner rectangle
        (60000L, 65535L, 0L, 65535L),   // one-dimensional slab
        (30000L, 34000L, 30000L, 34000L))) {
      val scan = DataLayout.skipScan(spark, dir,
        Seq(("x", xlo, xhi), ("y", ylo, yhi)))
      val want = full.where(col("x").between(xlo, xhi) && col("y").between(ylo, yhi))
        .select("id").as[Long].collect().sorted.toSeq
      val got = scan.df.select("id").as[Long].collect().sorted.toSeq
      assert(got == want, s"rows differ for [$xlo,$xhi]x[$ylo,$yhi]")
      assert(scan.filesTotal == 8)
    }
    // z-order locality: the corner rectangle (1/64 of the space) must not
    // touch most of the 8 files — that's the entire point of the layout.
    val corner = DataLayout.skipScan(spark, dir,
      Seq(("x", 0L, 8191L), ("y", 0L, 8191L)))
    assert(corner.filesRead <= 3,
      s"corner query read ${corner.filesRead}/8 files — layout not clustering")
  }

  test("stringDim is monotone in unsigned UTF-8 byte order") {
    import java.nio.charset.StandardCharsets.UTF_8
    def byteLt(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes(UTF_8), b.getBytes(UTF_8))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    val rnd = new scala.util.Random(42)
    val pool = "abcABC019 _-/éü中文🎉"
    val strings = Seq("", "a", "ab", "b", "aa", "é", "中", "中文", "z", "Z") ++
      (0 until 200).map(_ => (0 until rnd.nextInt(12))
        .map(_ => pool(rnd.nextInt(pool.length))).mkString)
    for (bits <- Seq(8, 16, 24, 56)) {
      val dims = strings.distinct.toDF("s")
        .select(col("s"), DataLayout.stringDim(col("s"), bits).as("d"))
        .as[(String, Long)].collect().toMap
      for (a <- dims.keys; b <- dims.keys if byteLt(a, b))
        assert(dims(a) <= dims(b),
          s"stringDim($bits) order broke: '$a'=${dims(a)} > '$b'=${dims(b)}")
      assert(dims.values.forall(_ >= 0L))
    }
    // NULL stays NULL
    assert(Seq(Option.empty[String]).toDF("s")
      .select(DataLayout.stringDim(col("s"), 16)).head().isNullAt(0))
  }

  test("a string-dim clustered layout prunes files on string ranges") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    val rnd = new scala.util.Random(7)
    val langs = Seq("ar", "de", "en", "es", "fr", "hi", "ja", "pt", "ru", "zh")
    val df = (0 until 4000).map { i =>
      (i.toLong, langs(rnd.nextInt(langs.length)), rnd.nextLong(4000))
    }.toDF("id", "lang", "n")
    DataLayout.writeZOrdered(df,
      Seq(DataLayout.stringDim(col("lang"), 16), col("n")), 16,
      statsCols = Seq("lang", "n"), outDir = dir, numFiles = 8)
    val scan = DataLayout.skipScan(spark, dir, Seq(("lang", "de", "en")))
    val want = df.where(col("lang") >= "de" && col("lang") <= "en")
      .select("id").as[Long].collect().sorted.toSeq
    assert(scan.df.select("id").as[Long].collect().sorted.toSeq == want)
    assert(scan.filesRead < scan.filesTotal,
      s"read ${scan.filesRead}/${scan.filesTotal} — string envelope never pruned")
  }

  test("semiJoinScan: exact semi-join rows, file-first pruning, nulls and dupes in keys") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir)
    val full = spark.read.parquet(dir)
    // a tight key cluster (the 4 lowest real x values, plus a duplicate):
    // on an x-clustered layout it must skip files
    val ks = full.select("x").distinct().orderBy("x").limit(4).as[Long].collect()
    val keys = (ks.toSeq :+ ks.head).toDF("x")
    val scan = DataLayout.semiJoinScan(spark, dir, keys, "x")
    val want = full.where(col("x").isin(ks: _*))
      .select("id").as[Long].collect().sorted.toSeq
    assert(want.nonEmpty &&
      scan.df.select("id").as[Long].collect().sorted.toSeq == want)
    assert(scan.filesTotal == 8 && scan.filesRead < 8,
      s"read ${scan.filesRead}/8 files — no pruning happened")
    // NULL keys match nothing (semi-join semantics), empty keys read nothing
    val nullScan = DataLayout.semiJoinScan(spark, dir,
      Seq(Option.empty[Long]).toDF("x"), "x")
    assert(nullScan.df.count() == 0L)
    val emptyScan = DataLayout.semiJoinScan(spark, dir,
      Seq.empty[Long].toDF("x"), "x")
    assert(emptyScan.filesRead == 0 && emptyScan.df.count() == 0L)
    // a DV'd row never comes back through the semi-join
    DataLayout.deleteVectors(spark, dir, Seq(("x", ks.head, ks.head)))
    val after = DataLayout.semiJoinScan(spark, dir, keys, "x")
    assert(!after.df.select("x").as[Long].collect().contains(ks.head))
    // stats-less key column refuses
    intercept[IllegalArgumentException] {
      DataLayout.semiJoinScan(spark, dir, Seq(1L).toDF("id"), "id")
    }
  }

  test("skipScan with an empty intersection reads zero files, zero rows") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir)
    val scan = DataLayout.skipScan(spark, dir, Seq(("x", 1000000L, 2000000L)))
    assert(scan.filesRead == 0 && scan.df.count() == 0L)
    // schema survives the empty path
    assert(scan.df.columns.toSet == Set("id", "x", "y"))
  }

  test("skipScan rejects a column the manifest has no stats for") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir)
    intercept[IllegalArgumentException] {
      DataLayout.skipScan(spark, dir, Seq(("id", 0L, 10L)))
    }
  }

  test("appendZOrdered extends the layout; compact heals the overlap") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    val rnd = new scala.util.Random(5)
    def mk(n: Int, idBase: Long) = (0 until n).map { i =>
      (idBase + i, rnd.nextLong(1 << 16), rnd.nextLong(1 << 16))
    }.toDF("id", "x", "y")
    DataLayout.writeZOrdered(mk(4000, 0L), Seq(col("x"), col("y")), 16,
      Seq("x", "y"), dir, numFiles = 8)
    // two delta batches — each clustered on its own, overlapping the base
    DataLayout.appendZOrdered(mk(500, 100000L), Seq(col("x"), col("y")), 16,
      Seq("x", "y"), dir, numFiles = 2)
    DataLayout.appendZOrdered(mk(500, 200000L), Seq(col("x"), col("y")), 16,
      Seq("x", "y"), dir, numFiles = 2)
    val manifest = spark.read.parquet(s"$dir/${DataLayout.ManifestDir}")
    assert(manifest.count() == 12L)
    assert(spark.read.parquet(dir).count() == 5000L)
    // append preserved skip-scan correctness (delta files overlap, so more
    // files are touched — correctness first, compaction repays the cost)
    def scanIds() = DataLayout.skipScan(spark, dir,
      Seq(("x", 0L, 8191L), ("y", 0L, 8191L)))
    val wantIds = spark.read.parquet(dir)
      .where(col("x") <= 8191L && col("y") <= 8191L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(scanIds().df.select("id").as[Long].collect().sorted.toSeq == wantIds)

    val report = DataLayout.compactZOrdered(spark, dir,
      Seq(col("x"), col("y")), 16, Seq("x", "y"), rowsPerFile = 700L)
    // the deltas overlap everything, so one big cluster rewrites into
    // ceil(5000/700) = 8 files; afterwards no z-ranges overlap
    assert(report.filesRewritten >= 10, s"$report")
    // version-routed read: retired files are invisible (the dir itself
    // still holds them until vacuum)
    assert(DataLayout.readLayout(spark, dir).count() == 5000L)
    val m2 = DataLayout.aliveManifest(spark, dir)
      .select("zmin", "zmax").as[(Long, Long)].collect().sortBy(_._1)
    m2.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, "z-ranges still overlap")
      case _ =>
    }
    assert(m2.length == report.filesTotalAfter)
    // correctness invariant under compaction
    assert(scanIds().df.select("id").as[Long].collect().sorted.toSeq == wantIds)
    // and the corner query is selective again
    assert(scanIds().filesRead < report.filesTotalAfter)
  }

  test("compact on a non-overlapping layout is a no-op") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir)
    val filesBefore = spark.read.parquet(s"$dir/${DataLayout.ManifestDir}")
      .select("file").as[String].collect().sorted.toSeq
    val report = DataLayout.compactZOrdered(spark, dir,
      Seq(col("x"), col("y")), 16, Seq("x", "y"), rowsPerFile = 1000L)
    assert(report.clustersRewritten == 0 && report.filesRewritten == 0)
    val filesAfter = spark.read.parquet(s"$dir/${DataLayout.ManifestDir}")
      .select("file").as[String].collect().sorted.toSeq
    assert(filesAfter == filesBefore, "no-op compact must not touch files")
  }

  test("deleteWhere rewrites only envelope-hit files; others stay byte-identical") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir) // 4000 rows, 8 files, dims (x, y) @16 bits
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def fileSums(): Map[String, Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val before = fileSums()
    val full = spark.read.parquet(dir).select("id", "x", "y")
      .as[(Long, Long, Long)].collect().toSeq
    val hit = full.count { case (_, x, y) =>
      x >= 0L && x <= 4095L && y >= 0L && y <= 4095L }
    val report = DataLayout.deleteWhere(spark, dir,
      Seq(col("x"), col("y")), 16, Seq("x", "y"),
      Seq(("x", 0L, 4095L), ("y", 0L, 4095L)))
    assert(report.rowsDeleted == hit && hit > 0)
    // the corner delete must not touch most of the 8 files
    assert(report.filesRewritten <= 3, s"$report")
    // survivors are exactly the complement (manifest-routed read)
    val after = DataLayout.readLayout(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq
    val want = full.collect { case (id, x, y)
      if !(x >= 0L && x <= 4095L && y >= 0L && y <= 4095L) => id }.sorted
    assert(after == want)
    // untouched files kept their exact identity (name + mtime)
    val untouchedBefore = before.filterNot(_._1.startsWith("delete_"))
    val kept = fileSums().filter(f => untouchedBefore.contains(f._1))
    assert(kept.size >= 5)
    kept.foreach { case (name, m) => assert(m == untouchedBefore(name), name) }
    // manifest stays consistent: alive n_rows sums to the survivor count
    // and skip-scan still answers exactly
    val manifest = DataLayout.aliveManifest(spark, dir)
    assert(manifest.agg(sum("n_rows")).head().getLong(0) == want.size.toLong)
    val scan = DataLayout.skipScan(spark, dir,
      Seq(("x", 0L, 8191L), ("y", 0L, 8191L)))
    val scanWant = full.collect { case (id, x, y)
      if x <= 8191L && y <= 8191L &&
        !(x <= 4095L && y <= 4095L) => id }.sorted
    assert(scan.df.select("id").as[Long].collect().sorted.toSeq == scanWant)
  }

  test("deleteWhere: rows with NULL in a range column survive") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    val rows = Seq((1L, Some(10L), 10L), (2L, None, 20L), (3L, Some(30L), 30L))
      .toDF("id", "x", "y")
    DataLayout.writeZOrdered(rows, Seq(col("x"), col("y")), 16,
      Seq("x", "y"), dir, numFiles = 1)
    val report = DataLayout.deleteWhere(spark, dir,
      Seq(col("x"), col("y")), 16, Seq("x", "y"),
      Seq(("x", 0L, 100L)))
    assert(report.rowsDeleted == 2L)
    assert(DataLayout.readLayout(spark, dir)
      .select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("z-key top-bit segments confine BOTH dimensions at once") {
    // bucket = z div 2^42 fixes the top 3 bits of each 24-bit dimension,
    // so every segment's rows live in a 1/8 x 1/8 rectangle — the property
    // that makes a dirty segment's follow-up predicate tight in 2-D
    // (q_zorder_segments) and few-files on a z-ordered layout
    val rnd = new scala.util.Random(17)
    val pts = Seq.fill(5000)((rnd.nextLong(1L << 24), rnd.nextLong(1L << 24)))
    val seg = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        call_function("div",
          DataLayout.zOrderKey(Seq(col("x"), col("y")), 24), lit(1L << 42)).as("b"))
      .groupBy("b")
      .agg(max("x") - min("x"), max("y") - min("y"))
      .as[(Long, Long, Long)].collect()
    assert(seg.nonEmpty)
    seg.foreach { case (b, xw, yw) =>
      assert(xw < (1L << 21) && yw < (1L << 21), s"bucket $b spans $xw x $yw")
    }
  }

  test("z-ordered layout beats a 1-D sort for 2-D rectangles (file touches)") {
    val rnd = new scala.util.Random(99)
    val df = (0 until 4000).map { i =>
      (i.toLong, rnd.nextLong(1 << 16), rnd.nextLong(1 << 16))
    }.toDF("id", "x", "y")
    val zDir = Files.createTempDirectory("graft_layout_spec").toString + "/z"
    val sDir = Files.createTempDirectory("graft_layout_spec").toString + "/s"
    DataLayout.writeZOrdered(df, Seq(col("x"), col("y")), 16,
      Seq("x", "y"), zDir, numFiles = 16)
    // 1-D layout: sort by x only (z-order with y contributing zero bits is
    // not expressible, so emulate with a single-dimension z-key = x)
    DataLayout.writeZOrdered(df, Seq(col("x")), 16,
      Seq("x", "y"), sDir, numFiles = 16)
    // A y-selective rectangle: x unbounded, y in a 1/8 slab. The x-sorted
    // layout must read every file; z-order reads roughly half or less.
    def touches(dir: String): Int =
      DataLayout.skipScan(spark, dir,
        Seq(("x", 0L, 65535L), ("y", 0L, 8191L))).filesRead
    assert(touches(sDir) == 16, "x-sorted layout should touch all files")
    assert(touches(zDir) <= 8,
      s"z-order should bound y: touched ${touches(zDir)}/16")
  }

  test("tableStatsFromManifest: exact counts/min/max/nulls, NDV within HLL error") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    // 3000 rows, x cycles 0..499 (NDV 500), y has nulls every 7th row
    val df = (0 until 3000).map { i =>
      (i.toLong, (i % 500).toLong,
        if (i % 7 == 0) None else Some((i % 80).toLong))
    }.toDF("id", "x", "y")
    DataLayout.writeZOrdered(df, Seq(col("x")), 16, Seq("x", "y"), dir, 6)
    val row = DataLayout.tableStatsFromManifest(spark, dir).head()
    val g = row.getValuesMap[Any](Seq("n_rows", "min_x", "max_x", "nulls_x",
      "ndv_x", "min_y", "max_y", "nulls_y", "ndv_y"))
    assert(g("n_rows") == 3000L && g("min_x") == 0L && g("max_x") == 499L)
    assert(g("nulls_x") == 0L)
    assert(g("nulls_y") == (0 until 3000).count(_ % 7 == 0).toLong)
    assert(g("min_y") == 0L && g("max_y") == 79L)
    // union-merged HLL: within a few % of true NDV despite 6-way split
    val ndvX = g("ndv_x").asInstanceOf[Long]
    assert(math.abs(ndvX - 500L) <= 25, s"ndv_x=$ndvX")
    val ndvY = g("ndv_y").asInstanceOf[Long]
    assert(math.abs(ndvY - 79L) <= 8, s"ndv_y=$ndvY")
    // stats survive maintenance: after a delete, the manifest-only
    // numbers track the new alive set
    DataLayout.deleteWhere(spark, dir, Seq(col("x")), 16, Seq("x", "y"),
      Seq(("x", 0L, 99L)))
    val after = DataLayout.tableStatsFromManifest(spark, dir).head()
    assert(after.getAs[Long]("n_rows") ==
      df.where(!col("x").between(0, 99)).count())
    assert(after.getAs[Long]("min_x") >= 100L)
  }

  test("mergeInto: upsert semantics, envelope targeting, time travel intact") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    // cluster BY the merge key: 8000 ids in 8 files => ~1000-id envelopes
    val base = (0 until 8000).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 8)
    // delta: update ids 100..119, insert ids 9000..9009 — all inside the
    // first file's envelope or beyond every envelope
    val delta = ((100 until 120).map(i => (i.toLong, s"UPD$i")) ++
      (9000 until 9010).map(i => (i.toLong, s"NEW$i"))).toDF("id", "payload")
    val before = DataLayout.aliveManifest(spark, dir).select("file")
      .collect().map(_.getString(0)).toSet
    val rep = DataLayout.mergeInto(spark, dir, Seq(col("id")), 16,
      Seq("id"), delta, Seq("id"), numFiles = 2)
    assert(rep.rowsUpdated == 20 && rep.rowsInserted == 10)
    // targeting: the 20 updates live in ONE of 8 files (ids 100-119); the
    // inserts hit no envelope — exactly one file rewrites
    assert(rep.filesRewritten == 1, rep.toString)
    // untouched files are byte-identical (never rewritten, never read back)
    val after = DataLayout.aliveManifest(spark, dir).select("file")
      .collect().map(_.getString(0)).toSet
    assert((before intersect after).size == 7)
    // merged content: updates replaced, inserts present, rest unchanged
    val got = DataLayout.readLayout(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got.size == 8010)
    assert(got(105L) == "UPD105" && got(9005L) == "NEW9005" && got(50L) == "v50")
    // pre-merge version still readable until vacuum
    val v0 = DataLayout.readLayout(spark, dir, 0L).as[(Long, String)].collect().toMap
    assert(v0.size == 8000 && v0(105L) == "v105" && !v0.contains(9005L))
  }

  test("mergeInto: insert-only delta rewrites nothing; contract refusals") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    val base = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 4)
    val inserts = (5000 until 5020).map(i => (i.toLong, s"NEW$i")).toDF("id", "payload")
    val rep = DataLayout.mergeInto(spark, dir, Seq(col("id")), 16,
      Seq("id"), inserts, Seq("id"), numFiles = 1)
    assert(rep.filesRewritten == 0 && rep.rowsUpdated == 0 && rep.rowsInserted == 20)
    assert(DataLayout.readLayout(spark, dir).count() == 1020L)
    // duplicate delta keys have no defined winner
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "payload")
    intercept[IllegalArgumentException] {
      DataLayout.mergeInto(spark, dir, Seq(col("id")), 16, Seq("id"),
        dup, Seq("id"), numFiles = 1)
    }
    // schema drift refused
    val wrong = Seq((1L, "a", 2L)).toDF("id", "payload", "extra")
    intercept[IllegalArgumentException] {
      DataLayout.mergeInto(spark, dir, Seq(col("id")), 16, Seq("id"),
        wrong, Seq("id"), numFiles = 1)
    }
  }

  test("bloomScan: exact rows, real pruning, absent key skips everything") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir, n = 4000, files = 8)
    val r = DataLayout.buildBloomIndex(spark, dir, "id")
    assert(r.filesIndexed == 8 && r.filesTotal == 8)
    // id is a dense sequence UNCORRELATED with the (x, y) clustering: the
    // min/max envelope on (x, y) cannot prune an id probe at all, but each
    // id lives in exactly one file — the bloom should skip most of the 8.
    val keys = Seq(5L, 1234L, 3999L, 999999L) // last one absent
    val scan = DataLayout.bloomScan(spark, dir, "id", keys)
    val want = spark.read.parquet(dir).where(col("id").isin(keys: _*))
      .select("id").as[Long].collect().sorted.toSeq
    assert(scan.df.select("id").as[Long].collect().sorted.toSeq == want)
    assert(scan.filesUnindexed == 0)
    assert(scan.filesRead < 8,
      s"bloom pruned nothing: read ${scan.filesRead}/8")
    // a key that exists nowhere must prune every file (8192 bits over
    // ~500 rows x 4 hashes: false-positive odds are negligible)
    val miss = DataLayout.bloomScan(spark, dir, "id", Seq(987654321L))
    assert(miss.filesRead == 0 && miss.df.count() == 0L)
  }

  test("bloom index: stale after append is extra I/O, never a wrong answer") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir, n = 4000, files = 8)
    DataLayout.buildBloomIndex(spark, dir, "id")
    // append rows the index has never seen
    val delta = (4000 until 4500).map { i =>
      (i.toLong, (i % 65536).toLong, ((i * 7) % 65536).toLong)
    }.toDF("id", "x", "y")
    DataLayout.appendZOrdered(delta, Seq(col("x"), col("y")), 16,
      Seq("x", "y"), dir, numFiles = 2)
    // probe a key that lives ONLY in the unindexed delta: the scan must
    // find it (unindexed files always read), and report the coverage gap
    val stale = DataLayout.bloomScan(spark, dir, "id", Seq(4321L))
    assert(stale.df.select("id").as[Long].collect().toSeq == Seq(4321L))
    assert(stale.filesUnindexed == 2)
    // incremental rebuild indexes ONLY the two delta files (cost ∝ delta)
    val r2 = DataLayout.buildBloomIndex(spark, dir, "id")
    assert(r2.filesIndexed == 2 && r2.filesTotal == 10)
    val fresh = DataLayout.bloomScan(spark, dir, "id", Seq(4321L))
    assert(fresh.filesUnindexed == 0)
    assert(fresh.df.select("id").as[Long].collect().toSeq == Seq(4321L))
    assert(fresh.filesRead < stale.filesRead,
      s"rebuilt index should prune the delta: ${fresh.filesRead} vs ${stale.filesRead}")
    // a third build is a no-op
    assert(DataLayout.buildBloomIndex(spark, dir, "id").filesIndexed == 0)
  }

  test("bloom index refuses param drift and missing prerequisites") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir, n = 1000, files = 4)
    intercept[IllegalArgumentException] {
      DataLayout.bloomScan(spark, dir, "id", Seq(1L)) // no index yet
    }
    DataLayout.buildBloomIndex(spark, dir, "id", numBits = 4096, numHashes = 3)
    intercept[IllegalArgumentException] { // param drift must not mix scales
      DataLayout.buildBloomIndex(spark, dir, "id", numBits = 8192)
    }
    intercept[IllegalArgumentException] {
      DataLayout.buildBloomIndex(spark, dir, "id", numBits = 100) // not /64
    }
    intercept[IllegalArgumentException] {
      DataLayout.bloomScan(spark, dir, "id", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      DataLayout.buildBloomIndex(spark, dir, "nope")
    }
  }

  test("bloomScan hashes probe keys in the column's on-disk type") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir, n = 1000, files = 4)
    DataLayout.buildBloomIndex(spark, dir, "id")
    // Int probes of a BIGINT column: xxhash64(42: int) != xxhash64(42L),
    // so an uncast probe would false-NEGATIVE. The cast inside bloomScan
    // makes integer-literal probes land.
    val scan = DataLayout.bloomScan(spark, dir, "id", Seq(42, 777))
    assert(scan.df.select("id").as[Long].collect().sorted.toSeq == Seq(42L, 777L))
  }

  test("pure-delete merge commits no orphan file; bloomScan survives empty") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    val base = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 4)
    DataLayout.buildBloomIndex(spark, dir, "id")
    // delete EVERY row via deleteKeys with an empty upsert delta: the
    // merged frame is empty, so the writer's schema-only part file must
    // be dropped, not renamed into the layout as an unmanifested orphan
    val emptyDelta = base.where(lit(false))
    val allKeys = base.select("id")
    val rep = DataLayout.mergeInto(spark, dir, Seq(col("id")), 16,
      Seq("id"), emptyDelta, Seq("id"), numFiles = 2,
      deleteKeys = Some(allKeys))
    assert(rep.rowsDeleted == 1000 && rep.rowsUpdated == 0 && rep.rowsInserted == 0)
    assert(rep.filesTotalAfter == 0, s"orphan counted: $rep")
    assert(DataLayout.aliveManifest(spark, dir).count() == 0L)
    // no merge_v* data file may exist on disk — a plain reader of the dir
    // sees only the (tombstoned) originals, never a stray empty file
    val onDisk = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.endsWith(".parquet"))
    assert(!onDisk.exists(_.startsWith("merge_v")), onDisk.mkString(","))
    // readLayout on the empty version yields a typed empty frame
    assert(DataLayout.readLayout(spark, dir).count() == 0L)
    // bloomScan on a zero-alive-files layout: empty result, no crash
    val scan = DataLayout.bloomScan(spark, dir, "id", Seq(5L))
    assert(scan.filesRead == 0 && scan.df.count() == 0L)
  }

  test("bloomScan stays plannable for a large point-lookup batch") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    writeSample(dir, n = 4000, files = 8)
    DataLayout.buildBloomIndex(spark, dir, "id")
    // 2000 probe keys x 4 hashes as a literal predicate tree would blow
    // past codegen limits; the join-based probe keeps the plan O(1)
    val keys: Seq[Any] = (0 until 2000).map(i => (i * 2).toLong)
    val scan = DataLayout.bloomScan(spark, dir, "id", keys)
    val want = spark.read.parquet(dir)
      .where(col("id").isin(keys: _*)).count()
    assert(scan.df.count() == want && want == 2000L)
  }

  test("tableStats over a pre-extension manifest reports unknown, not wrong") {
    val dir = Files.createTempDirectory("graft_layout_spec").toString + "/t"
    val base = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 4)
    // simulate a manifest written BEFORE the nulls_/hll_ stats extension:
    // strip those columns from the existing log in place
    val manifestDir = s"$dir/${DataLayout.ManifestDir}"
    val old = spark.read.parquet(manifestDir)
      .drop("nulls_id", "hll_id").collect()
    val oldSchema = spark.read.parquet(manifestDir)
      .drop("nulls_id", "hll_id").schema
    val tmp = Files.createTempDirectory("graft_layout_spec").toString + "/m"
    spark.createDataFrame(java.util.Arrays.asList(old: _*), oldSchema)
      .write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(manifestDir), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(manifestDir))
    // a new-schema append lands next to the old-schema log files
    val delta = (1000 until 1200).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    DataLayout.appendZOrdered(delta, Seq(col("id")), 16, Seq("id"), dir, 1)
    // mergeSchema keeps every column visible; additive stats fed by any
    // old-schema row must surface as NULL (unknown), never undercount
    val stats = DataLayout.tableStatsFromManifest(spark, dir).head()
    assert(stats.getAs[Long]("n_rows") == 1200L)
    assert(stats.getAs[Long]("min_id") == 0L && stats.getAs[Long]("max_id") == 1199L)
    assert(stats.isNullAt(stats.fieldIndex("nulls_id")),
      "nulls over a partly pre-extension manifest must be unknown")
    assert(stats.isNullAt(stats.fieldIndex("ndv_id")),
      "ndv over a partly pre-extension manifest must be unknown")
  }
}
