package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.{DataLayout, GraftSql}

/** Randomized equivalence fuzz for the r18 GENERAL SQL MERGE: seeded
  * random CDC batches (delete/update/upsert/no-op ops, random key overlap
  * with the table) run through GraftSql's conditional-arm statement, and
  * the layout's final content must equal the same semantics computed
  * directly over DataFrames (anti-join the deletes, apply the partial
  * SET to matched updates first-match-wins, insert the unmatched rows the
  * insert arm admits). Also pins atomicity (one version per statement). */
class MergeFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("general MERGE ≡ DataFrame-computed semantics across random CDC batches") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 6151)
      val n = 1000 + rnd.nextInt(4000)
      val dir = Files.createTempDirectory(s"graft_mfz$seed").toString + "/t"
      val base = spark.range(0, n).select(
        col("id"), (col("id") * 13 % 65536).as("x"),
        concat(lit("p"), col("id")).as("p"))
      base.write.format("graft").mode("overwrite")
        .option("dims", "x").option("statsCols", "id,x")
        .option("numFiles", (3 + rnd.nextInt(6)).toString).save(dir)
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW mfz_$seed USING graft " +
        s"OPTIONS (path '$dir')")
      // the CDC batch: keys half inside, half beyond the table; ops mixed
      val m = 200 + rnd.nextInt(400)
      val cdc = spark.range(0, m).select(
        (col("id") * (1 + rnd.nextInt(3)) % (n + n / 2)).as("id"),
        element_at(array(lit("D"), lit("U"), lit("U"), lit("N")),
          (pmod(col("id"), lit(4)) + 1).cast("int")).as("op"),
        (col("id") * 7 % 1000).as("nx"))
        .dropDuplicates("id") // mergeInto refuses ambiguous duplicate keys
        .localCheckpoint(true)
      cdc.createOrReplaceTempView(s"mfz_cdc_$seed")
      val v0 = DataLayout.currentVersion(spark, dir)
      GraftSql(spark,
        s"""MERGE INTO mfz_$seed t USING mfz_cdc_$seed s ON t.id = s.id
           |WHEN MATCHED AND s.op = 'D' THEN DELETE
           |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET x = s.nx
           |WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT (id, x)
           |  VALUES (s.id, s.nx)""".stripMargin)
      assert(DataLayout.currentVersion(spark, dir) == v0 + 1, "not atomic")
      // expected, computed directly over DataFrames
      val j = base.join(cdc.select(col("id"), col("op"), col("nx")),
        Seq("id"), "left")
      val kept = j.where(col("op").isNull || col("op") =!= "D")
        .select(col("id"),
          when(col("op") === "U", col("nx")).otherwise(col("x")).as("x"),
          col("p"))
      val inserted = cdc.join(base, Seq("id"), "left_anti")
        .where(col("op") =!= "D")
        .select(col("id"), col("nx").as("x"), lit(null).cast("string").as("p"))
      val want = kept.unionByName(inserted)
        .collect().map(_.toString).sorted.toSeq
      val got = DataLayout.readLayout(spark, dir)
        .select("id", "x", "p").collect().map(_.toString).sorted.toSeq
      assert(got == want,
        s"seed=$seed n=$n m=${cdc.count()} got=${got.size} want=${want.size}")
    }
  }
}
