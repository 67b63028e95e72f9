package graft.functions

import java.util.{HashMap => JHashMap}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding APPLICATION (Sennrich et al. 2016, §2.2; the encode
  * loop every GPT-family tokenizer runs) — the counterpart of
  * `q_bpe_pairs`, which only LEARNS merge statistics. Given a ranked merge
  * table, encode a text into subword tokens:
  *
  *   tokens := the text's characters (code points)
  *   loop: among adjacent token pairs, find the one whose merge has the
  *         LOWEST rank; if none is in the table, stop; otherwise merge all
  *         of its occurrences left-to-right (non-overlapping) and repeat.
  *
  * For a well-formed merge table — every merge whose side is itself a
  * compound token appears AFTER the merge that created that token, which
  * is true of any table a BPE learner emits — this greedy loop is
  * equivalent to applying each merge once, in ascending rank order, as a
  * single left-to-right pass: merging rank r only creates pairs involving
  * the new token, and any merge involving that token has rank > r. The
  * DuckDB oracle replays exactly that pass form as a chain of `replace()`
  * calls over a char-wrapped encoding (see TextQueries `q_bpe_encode`),
  * and `BpeEncodeSpec` pins the equivalence property on random inputs.
  *
  * Output: the subword tokens joined by a single space, with pure-space
  * tokens dropped (merges never contain a space, so spaces act as word
  * boundaries exactly as in word-level BPE). Scale shape: map-only — the
  * ranked merge table rides an explicit `Broadcast` (or the plan closure
  * for literal fixtures); the corpus never shuffles. Per-word results are
  * memoized per executor thread (Zipf: a few thousand distinct words
  * dominate any natural corpus), capped so state stays bounded.
  */
case class BpeEncode(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = BpeEncode.Name

  override protected def nullSafeEval(input: Any): Any =
    table.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  val Name = "graft_bpe_encode"

  /** Encode with a literal merge list (fixtures, specs). */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    encode(text, BpeTable.local(merges.toArray))

  /** Encode with a prepared table (broadcast path — see
    * `TextQueries.bpeEncode`). */
  def encode(text: Column, table: BpeTable): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text.cast("string")), table))
}

/** The ranked merge table, shippable either as a plan-closure literal
  * (small fixtures) or as a real `Broadcast` (vocab-sized tables: one copy
  * per executor, not per task). Rank = position in the array (0 = first
  * merge learned = applied with highest priority).
  */
final class BpeTable(
    localMerges: Array[(String, String)],
    bcMerges: Broadcast[Array[(String, String)]]) extends Serializable {

  private def mergesArr: Array[(String, String)] =
    if (bcMerges != null) bcMerges.value else localMerges

  /** The per-JVM runtime (rank map + word memo). Every TASK deserializes
    * its own BpeTable from the task binary, so instance-level lazy state
    * would rebuild the O(|merges|) rank map and start the memo cold once
    * per task — for the broadcast path, runtime state is therefore cached
    * JVM-wide keyed by the broadcast id (same lifetime as the broadcast
    * block itself); only closure-literal fixtures build per-instance. */
  @transient private lazy val runtime: BpeTable.Runtime =
    if (bcMerges != null) {
      // bounded: a long-lived executor that has seen many vocab
      // broadcasts wipes the map rather than growing it (rebuild is
      // cheap relative to the leak)
      if (BpeTable.runtimes.size() > 64) BpeTable.runtimes.clear()
      BpeTable.runtimes.computeIfAbsent(bcMerges.id,
        _ => new BpeTable.Runtime(mergesArr))
    } else new BpeTable.Runtime(mergesArr)

  private def rank: JHashMap[String, Integer] = runtime.rank
  private def cache: ThreadLocal[JHashMap[String, String]] = runtime.cache
  private def CacheCap = BpeTable.CacheCap

  def encode(text: UTF8String): UTF8String = {
    if (text == null) return null
    val words = text.toString.split(" ", -1)
    val sb = new java.lang.StringBuilder(text.numBytes + 16)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val enc = encodeWordCached(words(i))
        if (sb.length > 0) sb.append(' ')
        sb.append(enc)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def encodeWordCached(word: String): String = {
    val c = cache.get()
    val hit = c.get(word)
    if (hit != null) return hit
    val enc = encodeWord(word)
    if (c.size() >= CacheCap) c.clear()
    c.put(word, enc)
    enc
  }

  /** The greedy merge loop over one word's code points. */
  private def encodeWord(word: String): String = {
    var toks = new java.util.ArrayList[String](word.length)
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val n = Character.charCount(cp)
      toks.add(word.substring(ci, ci + n))
      ci += n
    }
    while (toks.size() > 1) {
      // lowest-rank adjacent pair present
      var best = -1
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < toks.size() - 1) {
        val r = rank.get(toks.get(j) + " " + toks.get(j + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); best = j }
        j += 1
      }
      if (best < 0) return String.join(" ", toks)
      val l = toks.get(best)
      val rgt = toks.get(best + 1)
      // merge ALL occurrences of (l, rgt), left-to-right, non-overlapping
      val out = new java.util.ArrayList[String](toks.size())
      var k = 0
      while (k < toks.size()) {
        if (k < toks.size() - 1 && toks.get(k) == l && toks.get(k + 1) == rgt) {
          out.add(l + rgt); k += 2
        } else { out.add(toks.get(k)); k += 1 }
      }
      toks = out
    }
    String.join(" ", toks)
  }
}

object BpeTable {
  private[functions] val CacheCap = 65536

  /** JVM-wide runtime state per broadcast vocab (see BpeTable.runtime). */
  private val runtimes =
    new java.util.concurrent.ConcurrentHashMap[Long, Runtime]()

  private[functions] final class Runtime(merges: Array[(String, String)]) {
    /** pair "left right" -> rank (tokens never contain a space: words are
      * split on spaces before encoding, so the separator is unambiguous). */
    val rank: JHashMap[String, Integer] = {
      val m = new JHashMap[String, Integer](merges.length * 2)
      var i = 0
      while (i < merges.length) {
        // first occurrence wins: a duplicate pair at a later rank is dead
        m.putIfAbsent(merges(i)._1 + " " + merges(i)._2, Integer.valueOf(i))
        i += 1
      }
      m
    }
    /** Per-thread word->encoding memo, size-capped so executor state stays
      * bounded (reset, not LRU — one wipe per 64k distinct words is cheaper
      * than bookkeeping on every hit). */
    val cache: ThreadLocal[JHashMap[String, String]] =
      ThreadLocal.withInitial[JHashMap[String, String]](() => new JHashMap())
  }

  /** Refuse merge tables that would not survive as a task-shipped closure
    * or broadcast — vocab-sized is fine, corpus-sized is a bug. */
  private val MaxMerges = 1 << 20

  def local(merges: Array[(String, String)]): BpeTable = {
    require(merges.length <= MaxMerges,
      s"merge table has ${merges.length} rows (cap $MaxMerges) — this is " +
        "not a vocab; refuse rather than ship it to every task")
    new BpeTable(merges, null)
  }

  def broadcast(bc: Broadcast[Array[(String, String)]]): BpeTable =
    new BpeTable(null, bc)
}
