package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.diff.KeySpace

/** Property-based checks over the pure key-arithmetic layer — the math that
  * silently corrupts segmentation if any edge case is off (the reference has
  * no property tests at all; these run in-memory, no Spark).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val alphanumChar = Gen.oneOf(KeySpace.Alphanums.toSeq)
  private val alphanumStr = Gen.nonEmptyListOf(alphanumChar).map(_.mkString)

  test("alphanum base-66 round trip: number→string→number is identity") {
    check(Prop.forAll(Gen.chooseNum(1L, Long.MaxValue)) { n =>
      KeySpace.alphanumToNumber(KeySpace.numberToAlphanum(BigInt(n))) == BigInt(n)
    })
  }

  test("alphanum string order after justification matches numeric order") {
    check(Prop.forAll(alphanumStr, alphanumStr) { (a, b) =>
      val n = math.max(a.length, b.length)
      val (ja, jb) = (a.padTo(n, KeySpace.Alphanums.head), b.padTo(n, KeySpace.Alphanums.head))
      KeySpace.alphanumToNumber(ja).compare(KeySpace.alphanumToNumber(jb)).sign ==
        ja.compare(jb).sign
    })
  }

  test("uuid render/parse round trip preserves the 128-bit value") {
    val big = for {
      hi <- Gen.chooseNum(0L, Long.MaxValue)
      lo <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (BigInt(hi) << 64) | BigInt(lo)
    check(Prop.forAll(big) { v =>
      KeySpace.UuidKey.parse(KeySpace.UuidKey(v).toString).value == v
    })
    check(Prop.forAll(big, big) { (v, w) =>
      // canonical fixed-width lowercase renders sort like the numbers
      (KeySpace.UuidKey(v).toString <= KeySpace.UuidKey(w).toString) == (v <= w)
    })
  }

  test("splitSpace checkpoints are strictly inside, increasing, distinct") {
    val ranges = for {
      start <- Gen.chooseNum(-1000000L, 1000000L)
      size <- Gen.chooseNum(31L, 1000000L)
      count <- Gen.chooseNum(1, 30)
    } yield (start, start + size, count)
    check(Prop.forAll(ranges) { case (start, end, count) =>
      val cuts = KeySpace.splitSpace(BigInt(start), BigInt(end), count)
      cuts.forall(c => c > start && c < end) && cuts == cuts.sorted &&
        cuts.distinct == cuts
    })
  }

  test("lexicographic space: fromIndex∘toIndex identity, order isomorphism, subtract") {
    val spaceAndIdx = for {
      d <- Gen.chooseNum(1, 4)
      los <- Gen.listOfN(d, Gen.chooseNum(-50L, 50L))
      sizes <- Gen.listOfN(d, Gen.chooseNum(1L, 9L))
      sp = KeySpace.BoundedLexicographicSpace(
        los.map(BigInt(_)), los.zip(sizes).map { case (l, s) => BigInt(l + s) })
      i <- Gen.chooseNum(0L, (sp.total - 1).toLong)
      j <- Gen.chooseNum(0L, (sp.total - 1).toLong)
    } yield (sp, i, j)
    check(Prop.forAll(spaceAndIdx) { case (sp, i, j) =>
      val (p, q) = (sp.fromIndex(BigInt(i)), sp.fromIndex(BigInt(j)))
      import scala.math.Ordering.Implicits._
      sp.toIndex(p) == BigInt(i) &&
        ((i < j) == (p.toList < q.toList)) &&
        sp.subtract(q, p) == BigInt(j) - BigInt(i)
    })
  }

  test("48-bit checksum offset keeps per-row values centered") {
    import graft.diff.Checksum
    check(Prop.forAll(Gen.chooseNum(0L, (1L << 48) - 1)) { h =>
      val shifted = h - Checksum.Offset
      shifted >= -(1L << 47) && shifted <= (1L << 47)
    })
  }
}
