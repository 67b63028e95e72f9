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

  test("H.264 RBSP escape/unescape round-trips arbitrary byte arrays") {
    import graft.multimodal.H264
    // zero-heavy generator: emulation prevention only fires on 00 00 0x
    // runs, so a uniform byte gen would barely exercise it
    val zeroHeavy = Gen.listOf(Gen.frequency(
      (6, Gen.const(0.toByte)), (2, Gen.choose(1, 3).map(_.toByte)),
      (2, Gen.choose(Byte.MinValue, Byte.MaxValue)))).map(_.toArray)
    check(Prop.forAll(zeroHeavy) { bytes =>
      val esc = H264.rbspEscape(bytes)
      // invariant: no 00 00 00 / 00 00 01 / 00 00 02 survives in the
      // escaped form (00 00 03 is the emulation marker itself — legal)
      val clean = (0 until esc.length - 2).forall(i =>
        !(esc(i) == 0 && esc(i + 1) == 0 && (esc(i + 2) & 0xff) <= 2))
      clean && java.util.Arrays.equals(H264.rbspUnescape(esc), bytes)
    })
  }

  test("H.264 Exp-Golomb ue/se/fixed-bit sequences round-trip through the bit IO") {
    import graft.multimodal.H264
    // a mixed program of writes replayed as reads must give back the
    // same values — the slice-header parser is exactly such a program
    val op: Gen[(Int, Long)] = Gen.oneOf(
      Gen.chooseNum(0, 100000).map(v => (0, v.toLong)),        // ue
      Gen.chooseNum(-50000, 50000).map(v => (1, v.toLong)),    // se
      for { n <- Gen.chooseNum(1, 24); v <- Gen.chooseNum(0L, (1L << n) - 1) }
        yield (2, (n.toLong << 32) | v))                       // u(n)
    check(Prop.forAll(Gen.listOf(op)) { ops =>
      val w = new H264.BitWriter
      ops.foreach {
        case (0, v) => w.writeUe(v.toInt)
        case (1, v) => w.writeSe(v.toInt)
        case (2, nv) => w.writeBits(nv & 0xffffffffL, (nv >>> 32).toInt)
      }
      val r = new H264.BitReader(w.finishRbsp())
      ops.forall {
        case (0, v) => r.readUe() == v.toInt
        case (1, v) => r.readSe() == v.toInt
        case (2, nv) => r.readBits((nv >>> 32).toInt) == (nv & 0xffffffffL)
      } && r.readBit() == 1 // the rbsp stop bit lands exactly after
    })
  }
}
