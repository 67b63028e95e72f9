package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench bookkeeping helpers that `--repin` / bench_best.json
  * depend on. Pure string-level tests — no SparkSession needed. */
class BenchSpec extends AnyFunSuite {

  test("parseGateTimes reads every gate, including non-q_ names") {
    val json =
      """{"metric":"total","value":1.5,"unit":"sec","gates":3,""" +
        """"queries":{"q1_agg":0.5,"q_topk":0.25,"q5_region_revenue":0.75},""" +
        """"sf":"/root/testdata/sf0.1","detail":"bench_last.json"}"""
    val parsed = Bench.parseGateTimes(json)
    assert(parsed === Map(
      "q1_agg" -> 0.5, "q_topk" -> 0.25, "q5_region_revenue" -> 0.75))
  }

  test("parseGateTimes ignores envelope keys and non-numeric values") {
    val json = """{"queries":{"q_a":1.0},"sf":"/x","quux":"notanumber"}"""
    assert(Bench.parseGateTimes(json) === Map("q_a" -> 1.0))
  }

  test("parseGateTimes handles scientific notation") {
    val parsed = Bench.parseGateTimes("""{"q_fast":9.5E-4,"q_slow":1.2e2}""")
    assert(parsed("q_fast") === 9.5e-4)
    assert(parsed("q_slow") === 120.0)
  }

  test("parseGateTimes skips the per-rep arrays in the detail format") {
    // bench_last.json now carries "reps":{"q_x":[a,b,c]} next to
    // "queries":{"q_x":min} — the arrays must not parse as gate times
    // (the regex requires a bare numeric value, and nothing inside an
    // array carries a "name":number shape)
    val json =
      """{"metric":"total","value":1.0,"unit":"sec",""" +
        """"queries":{"q_a":0.5,"q_b":0.5},""" +
        """"reps":{"q_a":[0.5,8.25,0.6],"q_b":[0.5,0.55,0.5]},"sf":"/x"}"""
    assert(Bench.parseGateTimes(json) === Map("q_a" -> 0.5, "q_b" -> 0.5))
  }

  test("parseGateTimes round-trips the best-file format") {
    val best =
      """{"metric":"best","value":0.73,"unit":"sec","sf":"/root/testdata/sf0.1",""" +
        """"queries":{"q1_agg":0.48,"q_hashdiff":0.25}}"""
    assert(Bench.parseGateTimes(best) === Map("q1_agg" -> 0.48, "q_hashdiff" -> 0.25))
  }

  test("prov entries and gate times stay disjoint in the stamped format") {
    // the r18 best-file format: numeric pins in "queries", string
    // provenance in "prov" — each parser must see only its own kind
    val best =
      """{"metric":"best","value":0.73,"unit":"sec","sf":"/root/testdata/sf0.1",""" +
        """"queries":{"q1_agg":0.48,"q_hashdiff":0.25},""" +
        """"prov":{"q1_agg":"abc1234 2026-08-16 full","q_hashdiff":"def5678 2026-08-15 repin"}}"""
    assert(Bench.parseGateTimes(best) === Map("q1_agg" -> 0.48, "q_hashdiff" -> 0.25))
    assert(Bench.parseProv(best) === Map(
      "q1_agg" -> "abc1234 2026-08-16 full",
      "q_hashdiff" -> "def5678 2026-08-15 repin"))
  }

  test("parseProv tolerates a pre-provenance best file") {
    val old = """{"metric":"best","value":0.5,"queries":{"q_a":0.5},"sf":"/x"}"""
    assert(Bench.parseProv(old) === Map.empty)
  }

  test("mergeBestAt: min semantics, forced replacement, provenance follows the winner") {
    // real gate names (stale gates are pruned against the live registry)
    val g1 = "q1_agg"; val g2 = "q_topk"; val g3 = "q_hashdiff"
    val p = java.nio.file.Files.createTempFile("graft_best", ".json")
    java.nio.file.Files.write(p,
      (s"""{"metric":"best","value":5.0,"unit":"sec","sf":"/sf",""" +
        s""""queries":{"$g1":2.0,"$g2":3.0},""" +
        s""""prov":{"$g1":"aaa 2026-01-01 full"}}""").getBytes("UTF-8"))
    // g1 improves (prov moves to the new run), g2 is WORSE but forced
    // into replacement (the drift adjudication), g3 is new
    Bench.mergeBestAt(p, "/sf",
      Map(g1 -> 1.5, g2 -> 4.5, g3 -> 0.7), mode = "full",
      replace = Set(g2))
    val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val times = Bench.parseGateTimes(s)
    assert(times(g1) == 1.5 && times(g2) == 4.5 && times(g3) == 0.7)
    val prov = Bench.parseProv(s)
    assert(prov(g1).endsWith(" full") && !prov(g1).startsWith("aaa"))
    assert(prov(g2).endsWith(" full"))
    assert(prov(g3).endsWith(" full"))
    // a slower non-replaced observation keeps BOTH the pin and its prov
    Bench.mergeBestAt(p, "/sf", Map(g1 -> 9.9), mode = "repin",
      replace = Set.empty)
    val s2 = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(Bench.parseGateTimes(s2)(g1) == 1.5)
    assert(Bench.parseProv(s2)(g1).endsWith(" full"))
    // a mismatched sf refuses the merge, leaving the file untouched
    Bench.mergeBestAt(p, "/other-sf", Map(g1 -> 0.1), "full", Set.empty)
    assert(Bench.parseGateTimes(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))(g1) == 1.5)
    java.nio.file.Files.deleteIfExists(p)
  }

  test("replaceSet: pins re-achieved within 1.3x stand, beyond get replaced") {
    val pins = Map("q_held" -> 1.0, "q_regressed" -> 1.64, "q_new" -> 2.0)
    val isolated = Seq(
      "q_held" -> 1.25,       // within 1.3x: ambient drift, pin stands
      "q_regressed" -> 4.1,   // 2.5x: unreachable — replace
      "q_unpinned" -> 9.9)    // no pin at all: nothing to replace
    assert(Bench.replaceSet(pins, isolated) === Set("q_regressed"))
  }
}
