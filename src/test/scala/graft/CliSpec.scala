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

  test("missing keys or sources rejected") {
    assertThrows[IllegalArgumentException](Cli.parseArgs(Array("/a", "/b")))
    assertThrows[IllegalArgumentException](Cli.parseArgs(Array("/a", "-k", "id")))
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
