package graft.diff

/** Driver-side key-space arithmetic for segmentation planning.
  *
  * Re-expresses the reference's key math (reference: data_diff/utils.py:
  * 120-326 ArithUUID/ArithAlphanumeric/split_space, data_diff/
  * table_segment.py:23-86 split_key_space/create_mesh_from_points,
  * data_diff/utils.py:417-456 product-order Vector): integer, 128-bit UUID
  * and base-66 alphanumeric keys all support "evenly split this range into
  * N segments", which is what lets a differ push key-range predicates for
  * any key type. Pure Scala — planning happens on the driver, the resulting
  * bounds become pushed-down DataFrame filters.
  */
object KeySpace {

  /** The base-66 alphabet, ASCII-sorted (reference: utils.py:123). */
  val Alphanums: String =
    " -" + ('0' to '9').mkString + ('A' to 'Z').mkString + "_" + ('a' to 'z').mkString

  // ---- keys ------------------------------------------------------------

  sealed trait Key {
    def toBigInt: BigInt
    def next: Key = this + 1
    def +(n: BigInt): Key
    def -(other: Key): BigInt = toBigInt - other.toBigInt
    def rangeTo(other: Key, count: Int): Seq[Key]
  }

  final case class IntKey(value: BigInt) extends Key {
    def toBigInt: BigInt = value
    def +(n: BigInt): Key = IntKey(value + n)
    def rangeTo(other: Key, count: Int): Seq[Key] =
      splitSpace(value, other.toBigInt, count).map(IntKey(_))
    override def toString: String = value.toString
  }

  /** UUID as a 128-bit integer with preserved casing and form — a key
    * parsed from a bare 32-hex string renders back bare, so segment-bound
    * predicates compare against the same textual form the table stores
    * (a dashed bound against bare-hex data would mis-sort: '-' < [0-9a-f])
    * (reference: utils.py:150-206). */
  final case class UuidKey(value: BigInt, uppercase: Boolean = false,
      dashed: Boolean = true) extends Key {
    require(value >= 0 && value < (BigInt(1) << 128), "uuid out of 128-bit range")
    def toBigInt: BigInt = value
    def +(n: BigInt): Key = copy(value = value + n)
    def rangeTo(other: Key, count: Int): Seq[Key] =
      splitSpace(value, other.toBigInt, count).map(i => copy(value = i))
    /** Canonical 8-4-4-4-12 (or bare 32-hex) rendering. */
    override def toString: String = {
      val hex = value.toString(16).reverse.padTo(32, '0').reverse
      val s = if (dashed)
        Seq(hex.substring(0, 8), hex.substring(8, 12), hex.substring(12, 16),
          hex.substring(16, 20), hex.substring(20, 32)).mkString("-")
      else hex
      if (uppercase) s.toUpperCase else s.toLowerCase
    }
  }

  object UuidKey {
    def parse(s: String): UuidKey = {
      val hex = s.replace("-", "")
      require(hex.length == 32, s"not a uuid: $s")
      UuidKey(BigInt(hex, 16), uppercase = hex.exists(_.isUpper),
        dashed = s.contains("-"))
    }
  }

  private val HexChars = ('0' to '9').toSet ++ ('a' to 'f') ++ ('A' to 'F')

  /** Is this string shaped like a UUID (canonical 8-4-4-4-12 — dashes at
    * exactly positions 8/13/18/23 — or bare 32 hex)? Stricter than
    * UuidKey.parse so that 32-char alphanumeric business keys don't get
    * misread as UUIDs. */
  def looksLikeUuid(s: String): Boolean = {
    val dashAt = Set(8, 13, 18, 23)
    val canonical = s.length == 36 &&
      s.zipWithIndex.forall { case (c, i) =>
        if (dashAt(i)) c == '-' else HexChars(c)
      }
    val bare = s.length == 32 && s.forall(HexChars)
    canonical || bare
  }

  /** String key → arithmetic key: UUIDs split over the 128-bit integer
    * space, everything else over the base-66 alphanumeric space
    * (reference: utils.py:150-307 picks ArithUUID vs ArithAlphanumeric the
    * same way in table_segment._make_key_range). */
  def parseStringKey(s: String): Key =
    if (looksLikeUuid(s)) UuidKey.parse(s) else AlphanumKey(s)

  /** Parse a SET of boundary strings from ONE key column consistently:
    * every value must be a same-form UUID (all dashed or all bare, all same
    * case) for the column to use 128-bit arithmetic — otherwise base-66. A
    * per-value choice could mix key types across min/max (splitKeySpace
    * would see a 128-bit 'min' above a base-66 'max' and fail — or worse,
    * silently build one unsplittable box). Case must be uniform too: mixed
    * upper/lower hex bounds sort by bytes ('F0' < 'a0') but by value
    * 0xF0 > 0xA0, so a mixed-case mesh disagrees with string comparison and
    * segments silently lose or double-count rows; both cases are in the
    * base-66 alphabet, so the fallback stays order-correct. */
  def parseStringKeysUniform(vs: Seq[String]): Seq[Key] = {
    val allUuid = vs.nonEmpty && vs.forall(looksLikeUuid) &&
      vs.map(_.contains("-")).distinct.size == 1 &&
      vs.map(_.exists(_.isUpper)).distinct.size == 1
    if (allUuid) vs.map(UuidKey.parse) else vs.map(AlphanumKey(_))
  }

  /** Alphanumeric strings as big-base numbers; comparison right-pads the
    * shorter side with the lowest symbol (' ') so ordering matches SQL
    * string ordering over the alphabet (reference: utils.py:209-307). */
  final case class AlphanumKey(value: String, maxLen: Option[Int] = None) extends Key {
    value.foreach(c => require(Alphanums.contains(c), s"unexpected character '$c'"))
    def toBigInt: BigInt = alphanumToNumber(value)
    def +(n: BigInt): Key = AlphanumKey(numberToAlphanum(toBigInt + n), maxLen)
    /** Exclusive-upper-bound successor in SQL STRING order, not base-66
      * arithmetic: value+1 can carry into a LONGER string that starts at
      * the low symbols ("zz"+1 = "-  "), which SQL-sorts BELOW the value
      * it should cap — a root box [lo, "-  ") then matches nothing and a
      * diff silently reports clean. Appending '-' (the lowest non-space
      * symbol) yields a string strictly above `value` in EVERY comparison
      * convention a remote engine may use: binary / NO PAD ("max-" >
      * "max"), right-pad-justified base-66 (value·66+1 > value·66), and
      * ANSI PAD SPACE ("max-" vs "max "-padded: '-' 0x2D > ' ' 0x20).
      * Appending ' ' instead would break PAD SPACE engines (SQL Server
      * char comparison, legacy MySQL collations): there 'max ' = 'max',
      * so `k < 'max '` is FALSE for the max key itself and the remote
      * side silently drops it — a spurious one-sided diff, or a missed
      * diff when both sides pad. No alphabet key sorts in ("max",
      * "max-") except "max"+spaces, which stay inside the bound in both
      * conventions, so no key is ever excluded. */
    override def next: Key = AlphanumKey(value + Alphanums(1), maxLen)
    override def -(other: Key): BigInt = other match {
      case AlphanumKey(o, _) =>
        val (a, b) = justify(value, o)
        alphanumToNumber(a) - alphanumToNumber(b)
      case _ => super.-(other)
    }
    def rangeTo(other: Key, count: Int): Seq[Key] = other match {
      case AlphanumKey(o, _) =>
        val (a, b) = justify(value, o)
        splitSpace(alphanumToNumber(a), alphanumToNumber(b), count)
          .map(n => AlphanumKey(numberToAlphanum(n), maxLen))
      case _ => throw new IllegalArgumentException("mixed key types")
    }
    override def toString: String =
      maxLen.fold(value)(n => value.reverse.padTo(n, Alphanums.head).reverse)
  }

  def alphanumToNumber(s: String): BigInt =
    s.foldLeft(BigInt(0))((acc, c) => acc * Alphanums.length + Alphanums.indexOf(c))

  def numberToAlphanum(n: BigInt): String = {
    val base = Alphanums.length
    if (n <= 0) "" else {
      val sb = new StringBuilder
      var x = n
      while (x > 0) { sb.append(Alphanums((x % base).toInt)); x /= base }
      sb.reverseContents().toString
    }
  }

  private def justify(s1: String, s2: String): (String, String) = {
    val n = math.max(s1.length, s2.length)
    (s1.padTo(n, Alphanums.head), s2.padTo(n, Alphanums.head))
  }

  // ---- range splitting -------------------------------------------------

  /** Evenly spaced interior checkpoints of [start, end)
    * (reference: utils.py:321-324). */
  def splitSpace(start: BigInt, end: BigInt, count: Int): Seq[BigInt] = {
    val size = end - start
    require(count <= size, s"cannot cut a space of $size into $count")
    val step = (size + 1) / (count + 1)
    Iterator.iterate(start)(_ + step).takeWhile(_ < end).slice(1, count + 1).toSeq
  }

  /** Checkpoints including both endpoints; a range smaller than `count`
    * collapses to a single cut (reference: table_segment.py:23-37). */
  def splitKeySpace(min: Key, max: Key, count: Int): Seq[Key] = {
    // compare via `-`, not raw toBigInt: AlphanumKey's base-66 value is only
    // order-isomorphic with SQL string order after right-pad justification,
    // which its `-` override applies ({"AA","Z"}: raw 792 vs 38, but "AA"<"Z")
    require(max - min > 0, "empty key range")
    val c = if (max - min <= count) 1 else count
    val checkpoints = min.rangeTo(max, c)
    min +: checkpoints :+ max
  }

  /** Per-dimension grids for a compound key
    * (reference: table_segment.py:46-48). */
  def splitCompoundKeySpace(mn: Seq[Key], mx: Seq[Key], count: Int): Seq[Seq[Key]] =
    mn.zip(mx).map { case (a, b) => splitKeySpace(a, b, count) }

  // ---- product-order vectors + mesh ------------------------------------

  /** Compound key with product order: v1 < v2 iff every component is <
    * (reference: utils.py:417-456). */
  final case class KeyVector(values: Seq[Key]) {
    def <(o: KeyVector): Boolean = values.zip(o.values).forall { case (a, b) => a.toBigInt < b.toBigInt }
    def <=(o: KeyVector): Boolean = values.zip(o.values).forall { case (a, b) => a.toBigInt <= b.toBigInt }
  }

  /** Lexicographic-order arithmetic over a bounded compound-key space
    * (reference: data_diff/lexicographic_space.py:63-165 — written for
    * hashdiff as an alternative to the product-order mesh, and like there
    * not wired into the default algorithm).
    *
    * Points are vectors with per-dimension bounds [lo_i, hi_i); treating a
    * point as a mixed-radix number maps the space order-isomorphically onto
    * [0, ∏ size_i), so add/subtract carry across dimensions and `range`
    * yields evenly spaced checkpoints in LEXICOGRAPHIC order — the order
    * compound keys actually sort in, unlike the product-order mesh's
    * aligned boxes. */
  final case class BoundedLexicographicSpace(lo: Seq[BigInt], hi: Seq[BigInt]) {
    require(lo.length == hi.length && lo.nonEmpty, "dimension mismatch")
    val sizes: Seq[BigInt] = lo.zip(hi).map { case (a, b) => b - a }
    require(sizes.forall(_ > 0), "empty dimension")
    val total: BigInt = sizes.product

    def toIndex(p: Seq[BigInt]): BigInt = {
      require(p.length == lo.length, "dimension mismatch")
      p.zip(lo).zip(sizes).foldLeft(BigInt(0)) { case (acc, ((v, l), sz)) =>
        val off = v - l
        require(off >= 0 && off < sz, s"point component $v out of bounds")
        acc * sz + off
      }
    }

    def fromIndex(i: BigInt): Seq[BigInt] = {
      require(i >= 0 && i < total, s"index $i out of space")
      val rev = sizes.reverse.scanLeft((i, BigInt(0))) { case ((rest, _), sz) =>
        (rest / sz, rest % sz)
      }.tail.map(_._2)
      rev.reverse.zip(lo).map { case (off, l) => l + off }
    }

    /** p + n with carry across dimensions. */
    def add(p: Seq[BigInt], n: BigInt): Seq[BigInt] = fromIndex(toIndex(p) + n)

    /** Number of points from q to p in lexicographic order. */
    def subtract(p: Seq[BigInt], q: Seq[BigInt]): BigInt = toIndex(p) - toIndex(q)

    /** `count` evenly spaced interior checkpoints of [from, until). */
    def range(from: Seq[BigInt], until: Seq[BigInt], count: Int): Seq[Seq[BigInt]] =
      splitSpace(toIndex(from), toIndex(until), count).map(fromIndex)
  }

  /** N-dimensional mesh of aligned boxes covering the grid; box count is
    * ∏(len_i − 1) (reference: table_segment.py:52-86). */
  def createMeshFromPoints(valuesPerDim: Seq[Seq[Key]]): Seq[(KeyVector, KeyVector)] = {
    require(valuesPerDim.forall(_.length >= 2), "each dimension needs >= 2 points")
    val ranges = valuesPerDim.map(vs => vs.init.zip(vs.tail))
    val product = ranges.foldLeft(Seq(Seq.empty[(Key, Key)])) { (acc, dim) =>
      for (prefix <- acc; r <- dim) yield prefix :+ r
    }
    product.map(box => (KeyVector(box.map(_._1)), KeyVector(box.map(_._2))))
  }
}
