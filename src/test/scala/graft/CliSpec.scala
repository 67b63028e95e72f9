package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.{Cli, Config, ParseTime}

class ParseTimeSpec extends AnyFunSuite {
  test("compound deltas parse like the reference grammar") {
    assert(ParseTime.parseTimeDelta("1d5h").getSeconds == 86400 + 5 * 3600)
    assert(ParseTime.parseTimeDelta("90s").getSeconds == 90)
    assert(ParseTime.parseTimeDelta("2w").getSeconds == 14 * 86400)
    assert(ParseTime.parseTimeDelta("1mon").getSeconds == 30 * 86400)
    assert(ParseTime.parseTimeDelta("1y").getSeconds == 365 * 86400)
  }

  test("rejects garbage, empty, and duplicate units") {
    assertThrows[IllegalArgumentException](ParseTime.parseTimeDelta(""))
    assertThrows[IllegalArgumentException](ParseTime.parseTimeDelta("5parsecs"))
    assertThrows[IllegalArgumentException](ParseTime.parseTimeDelta("xyz"))
    assertThrows[IllegalArgumentException](ParseTime.parseTimeDelta("1h2h"))
  }
}

class CliArgsSpec extends AnyFunSuite {
  test("full argument surface parses") {
    val a = Cli.parseArgs(Array("/a/t1", "csv:/b/t2", "-k", "id,sub", "-c", "x,y",
      "--algorithm", "hashdiff", "--stats", "--json", "--limit", "50",
      "--ignore", "noisy", "--update-column", "ts", "--min-age", "1d"))
    assert(a.sourceA == "/a/t1" && a.sourceB == "csv:/b/t2")
    assert(a.keys == Seq("id", "sub") && a.cols == Seq("x", "y"))
    assert(a.algorithm == "hashdiff" && a.stats && a.json && a.limit.contains(50))
    assert(a.ignore == Seq("noisy") && a.updateColumn.contains("ts") && a.minAge.contains("1d"))
  }

  test("reference short aliases parse: -a -s -i -l -t -m -w -j") {
    // a reference user's muscle memory must keep working (reference:
    // __main__.py short options)
    val a = Cli.parseArgs(Array("/a", "/b", "-k", "id", "-a", "hashdiff",
      "-s", "-l", "7", "-t", "updated_at", "-m", "/out", "-w", "id > 5",
      "-j", "4"))
    assert(a.algorithm == "hashdiff" && a.stats && a.limit.contains(7))
    assert(a.updateColumn.contains("updated_at") && a.materialize.contains("/out"))
    assert(a.where.contains("id > 5")) // -j/--threads accepted and ignored
    assert(Cli.parseArgs(Array("/a", "/b", "-k", "id", "-i")).interactive)
    // --materialize-to-table is the reference's long spelling
    assert(Cli.parseArgs(Array("/a", "/b", "-k", "id",
      "--materialize-to-table", "x")).materialize.contains("x"))
  }

  test("bisection knobs parse with the reference defaults") {
    val d = Cli.parseArgs(Array("/a", "/b", "-k", "id"))
    assert(d.bisectionFactor == 32 && d.bisectionThreshold == 16384)
    val a = Cli.parseArgs(Array("/a", "/b", "-k", "id",
      "--bisection-factor", "8", "--bisection-threshold", "1024"))
    assert(a.bisectionFactor == 8 && a.bisectionThreshold == 1024)
    // quantile seeding defaults ON (beyond ref); --no-quantile-seed
    // restores the reference's arithmetic checkpoints
    assert(d.quantileSeed)
    assert(!Cli.parseArgs(Array("/a", "/b", "-k", "id", "--no-quantile-seed")).quantileSeed)
    assert(Cli.parseArgs(Array("/a", "/b", "-k", "id", "--quantile-seed")).quantileSeed)
  }

  test("missing keys or sources rejected") {
    assertThrows[IllegalArgumentException](Cli.parseArgs(Array("/a", "/b")))
    assertThrows[IllegalArgumentException](Cli.parseArgs(Array("/a", "-k", "id")))
  }

  test("joindiff surface flags parse (where, unique-key, sampling, materialize knobs)") {
    val a = Cli.parseArgs(Array("/a", "/b", "-k", "id",
      "--where", "v > 10", "--assume-unique-key", "--sample-exclusive-rows",
      "--materialize-all-rows", "--table-write-limit", "250",
      "--case-sensitive", "-d", "--no-tracking", "--threads", "8"))
    assert(a.where.contains("v > 10") && a.assumeUniqueKey && a.sampleExclusiveRows)
    assert(a.materializeAllRows && a.tableWriteLimit == 250)
    assert(a.caseSensitive && a.verbose)
  }

  test("--version parses without sources") {
    assert(Cli.parseArgs(Array("--version")).version)
  }

  test("--force-repair implies --repair and lifts the dense-damage fraction") {
    val a = Cli.parseArgs(Array("/a", "remote:x", "-k", "id", "--force-repair"))
    assert(a.repair && a.forceRepair)
    val plain = Cli.parseArgs(Array("/a", "remote:x", "-k", "id", "--repair"))
    assert(plain.repair && !plain.forceRepair)
  }
}

class CliEndToEndSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("full CLI path: config file + flags → diff lines on stdout") {
    val dir = java.nio.file.Files.createTempDirectory("clie2e").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").write.parquet(s"$dir/ta")
    Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v").write.parquet(s"$dir/tb")
    val conf = s"$dir/conf.toml"
    java.nio.file.Files.write(java.nio.file.Paths.get(conf),
      s"""[run.t]
         |source_a = "$dir/ta"
         |source_b = "$dir/tb"
         |key_columns = ["k"]
         |""".stripMargin.getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array("--conf", conf, "--run", "t", "--json", "--stats")), spark)
    }
    val text = out.toString("UTF-8")
    val lines = text.linesIterator.filter(_.startsWith("{")).toSeq
    // k=2 updated (both signs), k=3 removed, k=4 added → 4 jsonl rows
    assert(lines.size == 4)
    assert(lines.count(_.contains("\"-\"")) == 2 && lines.count(_.contains("\"+\"")) == 2)
    assert(text.contains("1 rows removed") || text.toLowerCase.contains("removed"))
  }

  test("--tolerance suppresses within-epsilon drift end to end, parses strictly") {
    val dir = java.nio.file.Files.createTempDirectory("clitol").toString
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v").write.parquet(s"$dir/ta")
    Seq((1L, 10.004), (2L, 25.0), (3L, 30.0)).toDF("k", "v").write.parquet(s"$dir/tb")
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array(s"$dir/ta", s"$dir/tb", "-k", "k",
        "--tolerance", "v=0.01", "--json")), spark)
    }
    val lines = out.toString("UTF-8").linesIterator.filter(_.startsWith("{")).toSeq
    // only k=2 (drift 5.0 > eps) diffs; k=1's 0.004 is suppressed
    assert(lines.size == 2, lines.mkString("\n"))
    assert(lines.forall(_.contains("\"k\":2")), lines.mkString("\n"))
    // strict parse: garbage forms refuse with the flag named
    intercept[IllegalArgumentException] { Cli.parseArgs(Array("a", "b", "-k", "k",
      "--tolerance", "v")) }
    intercept[IllegalArgumentException] { Cli.parseArgs(Array("a", "b", "-k", "k",
      "--tolerance", "v=xyz")) }
  }

  test("--algorithm estimate runs the sampled pre-flight and still emits the exact diff") {
    val dir = java.nio.file.Files.createTempDirectory("cliest").toString
    (1L to 2000L).map(i => (i, s"v$i")).toDF("k", "v").write.parquet(s"$dir/ta")
    (1L to 2000L).map(i => (i, if (i % 400 == 0) s"v${i}M" else s"v$i"))
      .toDF("k", "v").write.parquet(s"$dir/tb")
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array(s"$dir/ta", s"$dir/tb", "-k", "k",
        "--algorithm", "estimate", "--json")), spark)
    }
    val lines = out.toString("UTF-8").linesIterator.filter(_.startsWith("{")).toSeq
    // 5 mutated keys → 10 signed rows, regardless of which differ the
    // estimate picked (sparse here → hashdiff)
    assert(lines.size == 10, lines.mkString("\n"))
  }

  test("-c wildcards expand like the reference's --columns (match_like)") {
    // unit semantics: % any run, ? one char, order preserved, deduped,
    // loud on no-match, case-insensitive unless asked otherwise
    val avail = Seq("o_orderkey", "o_custkey", "o_orderstatus", "note", "Note2")
    assert(Cli.expandColumnPatterns(Seq("o_%"), avail, caseSensitive = false) ==
      Seq("o_orderkey", "o_custkey", "o_orderstatus"))
    assert(Cli.expandColumnPatterns(Seq("note?"), avail, caseSensitive = false) ==
      Seq("Note2"))
    assert(Cli.expandColumnPatterns(Seq("NOTE%", "o_cust%"), avail, caseSensitive = false) ==
      Seq("note", "Note2", "o_custkey"))
    intercept[IllegalArgumentException]( // case-sensitive: NOTE% matches nothing
      Cli.expandColumnPatterns(Seq("NOTE%"), avail, caseSensitive = true))
    assert(Cli.expandColumnPatterns(Seq("literal_name"), avail, caseSensitive = false) ==
      Seq("literal_name")) // literals pass through untouched
    intercept[IllegalArgumentException](
      Cli.expandColumnPatterns(Seq("zz%"), avail, caseSensitive = false))
    // e2e: a wildcard -c equals the explicit spelling, keys never re-enter
    val dir = java.nio.file.Files.createTempDirectory("cliwild").toString
    (1L to 500L).map(i => (i, s"a$i", s"b$i", i * 1.5)).toDF("k", "va", "vb", "other")
      .write.parquet(s"$dir/ta")
    (1L to 500L).map(i => (i, if (i % 100 == 0) s"a${i}X" else s"a$i", s"b$i", i * 1.5))
      .toDF("k", "va", "vb", "other").write.parquet(s"$dir/tb")
    def runWith(c: String): Set[String] = {
      val out = new java.io.ByteArrayOutputStream
      Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
        Cli.run(Cli.parseArgs(Array(s"$dir/ta", s"$dir/tb", "-k", "k",
          "-c", c, "--json")), spark)
      }
      out.toString("UTF-8").linesIterator.filter(_.startsWith("{")).toSet
    }
    val viaWildcard = runWith("v%")
    val viaExplicit = runWith("va,vb")
    assert(viaWildcard == viaExplicit && viaWildcard.size == 10,
      s"${viaWildcard.size} vs ${viaExplicit.size}")
    intercept[IllegalArgumentException](runWith("nosuch%"))
    // a pattern matching ONLY the key must refuse — empty extraCols means
    // "all columns" downstream, the silent opposite of what was asked
    val e = intercept[IllegalArgumentException](runWith("k%"))
    assert(e.getMessage.contains("matched only key"), e.getMessage)
    // literal typos error like the reference's match_like, not mid-plan
    val e2 = intercept[IllegalArgumentException](runWith("vaa"))
    assert(e2.getMessage.contains("not found"), e2.getMessage)
    // the update column cannot re-enter through a wildcard even when its
    // -t casing differs from the catalog's (default case-insensitive)
    val out3 = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out3, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array(s"$dir/ta", s"$dir/tb", "-k", "k",
        "-c", "%", "-t", "OTHER", "--json")), spark)
    }
    val lines3 = out3.toString("UTF-8").linesIterator.filter(_.startsWith("{")).toSeq
    assert(lines3.size == 10 && !lines3.exists(_.contains("\"other\"")),
      s"update column leaked into the compare set: ${lines3.take(2)}")
  }

  test("estimate is the default: no flag measures first; --no-estimate restores joindiff") {
    // flag surface: no --algorithm → the sampled pre-flight; --no-estimate
    // → plain joindiff; an explicit algorithm always wins over both
    import graft.api.Graft
    def algoOf(args: Array[String]): Graft.Algorithm = {
      val a = Cli.parseArgs(args ++ Array("x", "y", "-k", "k"))
      a.algorithm match {
        case "" => if (a.noEstimate) Graft.Algorithm.Auto else Graft.Algorithm.Estimate
        case "auto" => Graft.Algorithm.Auto
        case "estimate" => Graft.Algorithm.Estimate
        case other => fail(s"unexpected $other")
      }
    }
    assert(algoOf(Array()) == Graft.Algorithm.Estimate)
    assert(algoOf(Array("--no-estimate")) == Graft.Algorithm.Auto)
    assert(algoOf(Array("--algorithm", "auto")) == Graft.Algorithm.Auto)
    assert(algoOf(Array("--no-estimate", "--algorithm", "estimate")) == Graft.Algorithm.Estimate)
    // e2e: BOTH regimes emit the identical rows on the same tables
    val dir = java.nio.file.Files.createTempDirectory("clinoest").toString
    (1L to 2000L).map(i => (i, s"v$i")).toDF("k", "v").write.parquet(s"$dir/ta")
    (1L to 2000L).map(i => (i, if (i % 400 == 0) s"v${i}M" else s"v$i"))
      .toDF("k", "v").write.parquet(s"$dir/tb")
    def runWith(extra: String*): Set[String] = {
      val out = new java.io.ByteArrayOutputStream
      Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
        Cli.run(Cli.parseArgs(Array(s"$dir/ta", s"$dir/tb", "-k", "k", "--json")
          ++ extra), spark)
      }
      out.toString("UTF-8").linesIterator.filter(_.startsWith("{")).toSet
    }
    val defaulted = runWith()           // measured pick (sparse → hashdiff)
    val plain = runWith("--no-estimate") // single-pass joindiff
    assert(defaulted == plain && defaulted.size == 10,
      s"regimes must agree: ${defaulted.size} vs ${plain.size}")
  }

  test("--where scopes both sides; --assume-unique-key skips PK validation") {
    val dir = java.nio.file.Files.createTempDirectory("cliwhere").toString
    // duplicate key k=1 on side a: validation must reject it by default
    Seq((1L, "a"), (1L, "dup"), (2L, "b"), (9L, "hi")).toDF("k", "v").write.parquet(s"$dir/ta")
    Seq((1L, "a"), (2L, "X"), (9L, "hi")).toDF("k", "v").write.parquet(s"$dir/tb")
    assertThrows[IllegalArgumentException] {
      Cli.run(Cli.parseArgs(Array(s"$dir/ta", s"$dir/tb", "-k", "k")), spark)
    }
    // --where excludes the duplicated key and the k=9 row; --assume-unique-key
    // then skips the (now unnecessary) validation pass entirely
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array(s"$dir/ta", s"$dir/tb", "-k", "k",
        "--where", "k = 2", "--assume-unique-key", "--json")), spark)
    }
    val lines = out.toString("UTF-8").linesIterator.filter(_.startsWith("{")).toSeq
    assert(lines.size == 2) // k=2 updated: one '-' and one '+', nothing else
    assert(lines.forall(_.contains("\"k\":2")))
  }

  test("--materialize-all-rows + --table-write-limit write the flagged outer join") {
    val dir = java.nio.file.Files.createTempDirectory("climatall").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").write.parquet(s"$dir/ta")
    Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v").write.parquet(s"$dir/tb")
    Console.withOut(new java.io.PrintStream(new java.io.ByteArrayOutputStream)) {
      Cli.run(Cli.parseArgs(Array(s"$dir/ta", s"$dir/tb", "-k", "k",
        "--materialize", s"$dir/all", "--materialize-all-rows", "--table-write-limit", "3")), spark)
    }
    val mat = spark.read.parquet(s"$dir/all")
    // reference all_rows shape: flags + a/b column pairs, unchanged included
    assert(mat.columns.toSet.contains("is_exclusive_a") && mat.columns.toSet.contains("is_diff_v"))
    assert(mat.count() == 3) // 4 outer-join rows capped by the write limit
  }

  test("--sample-exclusive-rows prints one-sided samples as Extra-Info") {
    val dir = java.nio.file.Files.createTempDirectory("clixcl").toString
    Seq((1L, "a"), (3L, "only-a")).toDF("k", "v").write.parquet(s"$dir/ta")
    Seq((1L, "a"), (4L, "only-b")).toDF("k", "v").write.parquet(s"$dir/tb")
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array(s"$dir/ta", s"$dir/tb", "-k", "k",
        "--sample-exclusive-rows")), spark)
    }
    val text = out.toString("UTF-8")
    assert(text.contains("Extra-Info:"))
    assert(text.contains("exclusive_sample_a = (3, only-a)"))
    assert(text.contains("exclusive_sample_b = (4, only-b)"))
  }

  test("--dbt mode diffs each built model dev vs prod and reports skips") {
    val dir = java.nio.file.Files.createTempDirectory("clidbt").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/target"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/target/run_results.json"),
      """{"results": [
        |  {"unique_id": "model.proj.users", "status": "success"},
        |  {"unique_id": "model.proj.nokeys", "status": "success"}]}""".stripMargin.getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/target/manifest.json"),
      """{"nodes": {
        |  "model.proj.users": {"name": "users", "columns": {
        |    "id": {"meta": {"primary-key": true}, "tags": []},
        |    "v": {"meta": {}, "tags": []}}},
        |  "model.proj.nokeys": {"name": "nokeys", "columns": {
        |    "x": {"meta": {}, "tags": []}}}}}""".stripMargin.getBytes("UTF-8"))
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$dir/prod/users.parquet")
    Seq((1L, "a"), (2L, "B")).toDF("id", "v").write.parquet(s"$dir/dev/users.parquet")
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array("--dbt", "--dbt-project-dir", dir,
        "--dbt-dev-base", s"$dir/dev", "--dbt-prod-base", s"$dir/prod")), spark)
    }
    val text = out.toString("UTF-8")
    assert(text.contains("skipped nokeys: no primary-key columns declared"))
    assert(text.contains("users:") && text.toLowerCase.contains("updated"))
    // missing bases fail at parse time, before Spark is touched
    assertThrows[IllegalArgumentException](Cli.parseArgs(Array("--dbt")))

    // --select filters by model-name glob; --state reads artifacts from an
    // alternate dir; --prod-database/--prod-schema compose the prod base
    val stateDir = s"$dir/elsewhere"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
    for (f <- Seq("run_results.json", "manifest.json"))
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/target/$f"),
        java.nio.file.Paths.get(s"$stateDir/$f"))
    val out2 = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out2, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array("--dbt", "--dbt-project-dir", "/nonexistent",
        "--state", stateDir, "--select", "us*",
        "--dbt-dev-base", s"$dir/dev",
        "--prod-database", dir, "--prod-schema", "prod",
        "--dbt-profiles-dir", "/ignored")), spark)
    }
    val t2 = out2.toString("UTF-8")
    assert(t2.contains("users:") && t2.toLowerCase.contains("updated"), t2)
    // a selector that matches nothing reports every model as unselected
    val out3 = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out3, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array("--dbt", "--dbt-project-dir", dir,
        "--select", "orders*",
        "--dbt-dev-base", s"$dir/dev", "--dbt-prod-base", s"$dir/prod")), spark)
    }
    assert(out3.toString("UTF-8").contains("skipped users: not selected by 'orders*'"))
    // --cloud refuses loudly: there is no SaaS backend here
    val e = intercept[IllegalArgumentException](Cli.parseArgs(Array("--cloud", "x", "y")))
    assert(e.getMessage.contains("locally"))
  }

  test("--version prints and exits before any source is touched") {
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array("--version")), spark)
    }
    assert(out.toString("UTF-8").contains("graft"))
  }

  test("pushdown CLI: --no-quantile-seed and the seeded default emit the identical diff") {
    // skewed snowflake-ID keys — the shape quantile seeding exists for;
    // both paths must produce the same rows (seeding only moves split
    // points, never coverage)
    val dir = java.nio.file.Files.createTempDirectory("cliqs").toString
    val keys = ((1L to 400L) ++ (1_000_000_000L to 1_000_000_400L)).toSeq
    keys.map(k => (k, s"v$k")).toDF("k", "v").write.parquet(s"$dir/local")
    val setup = graft.sources.DuckDbProcess.engine(s"$dir/remote.db")
    try {
      val rows = keys.map(k =>
        if (k % 97 == 3) s"($k, 'v${k}X')" else s"($k, 'v$k')").mkString(", ")
      setup.query(s"CREATE TABLE t AS SELECT * FROM (VALUES $rows) AS x(k, v)")
    } finally setup.close()
    def run(extra: String*): Seq[String] = {
      val out = new java.io.ByteArrayOutputStream
      Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
        Cli.run(Cli.parseArgs(Array(s"$dir/local", s"duckdb:$dir/remote.db:t",
          "-k", "k", "--json", "--bisection-factor", "4",
          "--bisection-threshold", "64") ++ extra), spark)
      }
      out.toString("UTF-8").linesIterator.filter(_.startsWith("{")).toSeq.sorted
    }
    val seeded = run()
    val arith = run("--no-quantile-seed")
    assert(seeded.nonEmpty && seeded == arith,
      s"seeded=${seeded.size} arith=${arith.size}")
  }

  test("full CLI pushdown path against a live DuckDB database file") {
    val dir = java.nio.file.Files.createTempDirectory("clipd").toString
    Seq((1L, "a", 10.5), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v").write.parquet(s"$dir/local")
    // remote side lives in a real DuckDB database file: k=2 mutated, k=3
    // missing, k=4 added — the CLI must introspect its schema and diff
    val setup = graft.sources.DuckDbProcess.engine(s"$dir/remote.db")
    try {
      setup.query("CREATE TABLE t AS SELECT * FROM (VALUES " +
        "(1::BIGINT, 'a', 10.5::DOUBLE), (2::BIGINT, 'B', 20.0::DOUBLE), " +
        "(4::BIGINT, 'd', 40.0::DOUBLE)) AS x(k, s, v)")
    } finally setup.close()
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array(s"$dir/local", s"duckdb:$dir/remote.db:t",
        "-k", "k", "--json")), spark)
    }
    val lines = out.toString("UTF-8").linesIterator.filter(_.startsWith("{")).toSeq
    // k=2 updated (both signs), k=3 removed, k=4 added → 4 jsonl rows
    assert(lines.size == 4, s"got: ${lines.mkString("\n")}")
    assert(lines.count(_.contains("\"-\"")) == 2 && lines.count(_.contains("\"+\"")) == 2)
    // pushdown leaf rows surface in normalized string space (the same
    // downloaded-row rendering the reference emits)
    assert(lines.exists(l => l.contains("\"k\":\"4\"") && l.contains("\"+\"")),
      s"got: ${lines.mkString("\n")}")
  }

  test("--repair patches the live remote to match the local side; re-diff is empty") {
    val dir = java.nio.file.Files.createTempDirectory("clirep").toString
    Seq((1L, "a", 10.5), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v").write.parquet(s"$dir/local")
    val setup = graft.sources.DuckDbProcess.engine(s"$dir/remote.db")
    try {
      setup.query("CREATE TABLE t AS SELECT * FROM (VALUES " +
        "(1::BIGINT, 'a', 10.5::DOUBLE), (2::BIGINT, 'B', 20.0::DOUBLE), " +
        "(4::BIGINT, 'd', 40.0::DOUBLE)) AS x(k, s, v)")
    } finally setup.close()
    Console.withOut(new java.io.PrintStream(new java.io.ByteArrayOutputStream)) {
      Cli.run(Cli.parseArgs(Array(s"$dir/local", s"duckdb:$dir/remote.db:t",
        "-k", "k", "--repair")), spark)
    }
    // the remote database FILE now holds exactly the local rows
    val check = graft.sources.DuckDbProcess.engine(s"$dir/remote.db")
    try {
      val got = check.query("""SELECT k, s, v FROM t ORDER BY k""")
        .map(_.map(_.get))
      assert(got == Seq(Seq("1", "a", "10.5"), Seq("2", "b", "20.0"),
        Seq("3", "c", "30.0")), s"remote after repair: $got")
    } finally check.close()
    // and a re-diff prints no rows
    val out2 = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out2, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array(s"$dir/local", s"duckdb:$dir/remote.db:t",
        "-k", "k", "--json")), spark)
    }
    assert(!out2.toString("UTF-8").linesIterator.exists(_.startsWith("{")),
      s"re-diff not empty: ${out2.toString("UTF-8")}")
  }

  test("--materialize remote:<table> writes the diff into the live remote database") {
    val dir = java.nio.file.Files.createTempDirectory("climat").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s").write.parquet(s"$dir/local")
    val setup = graft.sources.DuckDbProcess.engine(s"$dir/remote.db")
    try setup.query("CREATE TABLE t AS SELECT * FROM (VALUES " +
      "(1::BIGINT, 'a'), (2::BIGINT, 'B')) AS x(k, s)")
    finally setup.close()
    Console.withOut(new java.io.PrintStream(new java.io.ByteArrayOutputStream)) {
      Cli.run(Cli.parseArgs(Array(s"$dir/local", s"duckdb:$dir/remote.db:t",
        "-k", "k", "--materialize", "remote:diff_report")), spark)
      // re-run with the same target: drop-before-create must REPLACE the
      // report, not fail on CREATE (reference drops the target first)
      Cli.run(Cli.parseArgs(Array(s"$dir/local", s"duckdb:$dir/remote.db:t",
        "-k", "k", "--materialize", "remote:diff_report")), spark)
    }
    val check = graft.sources.DuckDbProcess.engine(s"$dir/remote.db")
    try {
      // k=2 updated (both signs) + k=3 removed → 3 materialized rows
      // (not 6: the second run replaced the first's report)
      val got = check.query("""SELECT sign, k FROM diff_report ORDER BY k, sign""")
        .map(_.map(_.get))
      assert(got == Seq(Seq("+", "2"), Seq("-", "2"), Seq("-", "3")), s"got $got")
    } finally check.close()
  }

  test("--repair refuses a local side B (no in-place parquet update)") {
    val dir = java.nio.file.Files.createTempDirectory("cliref").toString
    Seq((1L, "a")).toDF("k", "s").write.parquet(s"$dir/a")
    Seq((1L, "b")).toDF("k", "s").write.parquet(s"$dir/b")
    val e = intercept[IllegalArgumentException] {
      Console.withOut(new java.io.PrintStream(new java.io.ByteArrayOutputStream)) {
        Cli.run(Cli.parseArgs(Array(s"$dir/a", s"$dir/b", "-k", "k", "--repair")), spark)
      }
    }
    assert(e.getMessage.contains("applyDiff"))
  }

  test("CLI remote-remote: both sides are duckdb database files, Spark coordinates") {
    val dir = java.nio.file.Files.createTempDirectory("clirr").toString
    def mk(db: String, rows: String): Unit = {
      val e = graft.sources.DuckDbProcess.engine(db)
      try e.query(s"CREATE TABLE t AS SELECT * FROM (VALUES $rows) AS x(k, s)")
      finally e.close()
    }
    mk(s"$dir/a.db", "(1::BIGINT, 'a'), (2::BIGINT, 'b'), (3::BIGINT, 'c')")
    mk(s"$dir/b.db", "(1::BIGINT, 'a'), (2::BIGINT, 'B'), (4::BIGINT, 'd')")
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array(s"duckdb:$dir/a.db:t", s"duckdb:$dir/b.db:t",
        "-k", "k", "--json", "--stats")), spark)
    }
    val text = out.toString("UTF-8")
    val lines = text.linesIterator.filter(_.startsWith("{")).toSeq
    assert(lines.size == 4, s"got: ${lines.mkString("\n")}")
    assert(lines.exists(l => l.contains("\"k\":\"4\"") && l.contains("\"+\"")))
    assert(lines.exists(l => l.contains("\"k\":\"3\"") && l.contains("\"-\"")))
    assert(text.toLowerCase.contains("updated")) // stats from diff + remote COUNT
  }

  test("CLI remote source FIRST: signs still mean '-' = side A") {
    val dir = java.nio.file.Files.createTempDirectory("clirf").toString
    val e = graft.sources.DuckDbProcess.engine(s"$dir/a.db")
    try e.query("CREATE TABLE t AS SELECT * FROM (VALUES " +
      "(1::BIGINT, 'a'), (2::BIGINT, 'B'), (4::BIGINT, 'd')) AS x(k, s)")
    finally e.close()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s").write.parquet(s"$dir/local")
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.run(Cli.parseArgs(Array(s"duckdb:$dir/a.db:t", s"$dir/local",
        "-k", "k", "--json")), spark)
    }
    val lines = out.toString("UTF-8").linesIterator.filter(_.startsWith("{")).toSeq
    assert(lines.size == 4, s"got: ${lines.mkString("\n")}")
    // k=4 exists only in A (the remote, listed first) → removed; k=3 only in B → added
    assert(lines.exists(l => l.contains("\"k\":\"4\"") && l.contains("\"-\"")),
      s"got: ${lines.mkString("\n")}")
    assert(lines.exists(l => l.contains("\"k\":\"3\"") && l.contains("\"+\"")))
    // updated key carries A's value under '-' and B's under '+'
    assert(lines.exists(l => l.contains("\"k\":\"2\"") && l.contains("\"-\"") && l.contains("\"B\"")))
  }

  test("explicit --algorithm joindiff with a duckdb: remote source fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("clialgo").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/ta")
    // pushdown always runs hashdiff; silently dropping an explicit joindiff
    // choice would mislead (reference: joindiff requires same-DB sides)
    val e = intercept[IllegalArgumentException] {
      Cli.run(Cli.parseArgs(Array(s"$dir/ta", s"duckdb:$dir/b.db:t",
        "-k", "k", "--algorithm", "joindiff")), spark)
    }
    assert(e.getMessage.contains("joindiff"))
    // hashdiff and auto are honored (pushdown IS hashdiff) — parse-level only
    Cli.parseArgs(Array(s"$dir/ta", s"duckdb:$dir/b.db:t", "-k", "k", "--algorithm", "hashdiff"))
  }
}

class ConfigSpec extends AnyFunSuite {
  private val toml =
    """# run configurations
      |[run.nightly]
      |source_a = "/data/a"   # prod
      |source_b = "csv:/data/b"
      |key_columns = ["id", "sub"]
      |algorithm = "hashdiff"
      |where = "x > 0"
      |table_write_limit = 500
      |min_age = "1d"
      |limitish = 50
      |verbose = true
      |""".stripMargin

  test("subset-TOML parses sections, strings, arrays, ints, booleans, comments") {
    val c = Config.parse(toml)
    assert(c("run.nightly.source_a") == Seq("/data/a"))
    assert(c("run.nightly.key_columns") == Seq("id", "sub"))
    assert(c("run.nightly.limitish") == Seq("50"))
    assert(c("run.nightly.verbose") == Seq("true"))
    assertThrows[IllegalArgumentException](Config.parse("key = unquoted words"))
  }

  test("config fills unset args; explicit CLI flags win (reference config.py)") {
    val fromConf = Config.applyRun(Config.parse(toml), "nightly", Cli.Args())
    assert(fromConf.sourceA == "/data/a" && fromConf.sourceB == "csv:/data/b")
    assert(fromConf.keys == Seq("id", "sub") && fromConf.algorithm == "hashdiff")
    assert(fromConf.minAge.contains("1d"))
    assert(fromConf.where.contains("x > 0") && fromConf.tableWriteLimit == 500)
    val cliWins = Config.applyRun(Config.parse(toml), "nightly",
      Cli.Args(sourceA = "/override", algorithm = "joindiff"))
    assert(cliWins.sourceA == "/override" && cliWins.algorithm == "joindiff")
    assert(cliWins.sourceB == "csv:/data/b") // still filled from config
  }

  test("%t materialize template expands to a timestamp") {
    val n = graft.api.Graft.evalNameTemplate("diff_%t")
    assert(n.matches("diff_\\d{8}_\\d{6}"))
  }
}
