package graft.diff

import org.apache.spark.sql.{DataFrame, Dataset}

/** Result formats for diff output (reference: data_diff/__main__.py:418-436
  * JSONL rows, data_diff/diff_tables.py:138-186 stats string/dict). */
object DiffFormat {

  /** One JSON object per diff row — the reference's `--json` stream. */
  def toJsonl(diff: DataFrame): Dataset[String] = diff.toJSON

  final case class DiffStatsResult(
      removed: Long, added: Long, updated: Long, unchanged: Long) {
    def totalDiff: Long = removed + added + updated
    def percentDifferent: Double = {
      val total = removed + added + updated + unchanged
      if (total == 0) 0.0 else 100.0 * totalDiff / total
    }
  }

  /** Collect a JoinDiffer.stats frame into a typed result. NAMED lookups:
    * positional reads would silently transpose counts if the stats
    * aggregate ever gained or reordered a column. */
  def collectStats(stats: DataFrame): DiffStatsResult = {
    val r = stats.head()
    DiffStatsResult(r.getAs[Long]("removed"), r.getAs[Long]("added"),
      r.getAs[Long]("updated"), r.getAs[Long]("unchanged"))
  }

  /** Human summary line (reference: diff_tables.py:138-160). */
  def statsString(s: DiffStatsResult): String =
    f"${s.added} rows added, ${s.removed} rows removed, ${s.updated} rows updated, " +
      f"${s.unchanged} rows unchanged, ${s.percentDifferent}%.2f%% difference"
}
