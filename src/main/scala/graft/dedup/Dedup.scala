package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for large text corpora.
  *
  * Four families, all shuffle-conscious:
  *  - exact:   one groupBy on a 128-bit content hash.
  *  - n-gram Jaccard: shingle inverted index with a document-frequency cap
  *    (stop-shingles would otherwise blow up the candidate join on a skewed
  *    corpus — the cap bounds per-shingle fan-out at df^2 pairs).
  *  - MinHash + LSH: 64 md5-derived min-hashes, 16 bands × 4 rows; candidate
  *    pairs share at least one band bucket. Only signatures shuffle, never
  *    documents.
  *  - SimHash: 48-bit bit-majority hash; near-dups have small Hamming
  *    distance. Hashes are md5-based so any engine reproduces them.
  */
object Dedup {

  /** 48-bit integer from the first 12 md5 hex digits of `c`. */
  def md5Int48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Exact dedup groups: content hash → canonical (min) id + copy count. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** (id, shingle) inverted-index rows, distinct shingles per doc. */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(TextFunctions.shingles(col(textCol), n)).as("s"))

  /** Near-duplicate pairs by exact n-gram Jaccard ≥ threshold. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, dfCap: Int = 50): DataFrame = {
    val sh = shingleIndex(df, idCol, textCol)
    val freq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val kept = sh.join(freq.where(col("df") <= dfCap), Seq("s"))
      .select("doc_id", "s")
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairs = kept.select(col("doc_id").as("doc_a"), col("s"))
      .join(kept.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sa")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sb")), Seq("doc_b"))
      .withColumn("jaccard", col("n_common") / (col("sa") + col("sb") - col("n_common")))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }

  /** MinHash signatures: one row per (doc, hash index i) with the min hash. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64): DataFrame =
    shingleIndex(df, idCol, textCol)
      .select(col("doc_id"), explode(sequence(lit(0), lit(numHashes - 1))).as("i"), col("s"))
      .withColumn("h", md5Int48(concat(col("i").cast("string"), lit(":"), col("s"))))
      .groupBy("doc_id", "i").agg(min(col("h")).as("mh"))

  /** LSH band buckets: md5 of the i-ordered signature slice per band. */
  def lshBands(signatures: DataFrame, rowsPerBand: Int = 4): DataFrame =
    signatures
      .withColumn("band", floor(col("i") / rowsPerBand).cast("long"))
      .groupBy("doc_id", "band")
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("i"), col("mh")))),
          x => x.getField("mh").cast("string")), ",")).as("bh"))

  /** Candidate near-dup pairs: docs sharing ≥1 LSH band bucket. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, rowsPerBand: Int = 4): DataFrame = {
    val bands = lshBands(minhashSignatures(df, idCol, textCol, numHashes), rowsPerBand)
    bands.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("bh")), Seq("band", "bh"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared_bands"))
  }

  /** 48-bit SimHash per document over distinct whitespace tokens. */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 48): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
    val bitSums = toks
      .withColumn("h", md5Int48(col("tok")))
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(bits - 1))).as("i"))
      .withColumn("sign", when(expr("(shiftright(h, i) & 1) = 1"), 1L).otherwise(-1L))
      .groupBy("doc_id", "i").agg(sum(col("sign")).as("s"))
    bitSums.groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(cast(1 as bigint), i)")).otherwise(0L))
        .as("simhash"))
  }
}
