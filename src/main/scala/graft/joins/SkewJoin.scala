package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins.
  *
  * A shuffle join sends every row of a key to one reducer; a hot key (the
  * classic 100 TB failure mode) turns that reducer into the job's critical
  * path. Salting splits each hot key into `salt` sub-keys: the large side
  * gets a per-row deterministic salt, the small side is replicated `salt`×
  * with every salt value, and the join key becomes (key, salt) — the hot
  * key's rows now spread over `salt` reducers. The result is EXACTLY the
  * plain join (each large-side row still meets each matching small-side row
  * once, under its own salt).
  *
  * Complements AQE's skew-split (spark.sql.adaptive.skewJoin), which only
  * fires on sort-merge joins above size thresholds; explicit salting also
  * covers skewed aggregations feeding joins and documents the intent.
  */
object SkewJoin {

  /** Inner equi-join of a large skewed `left` against a smaller `right`,
    * salted `salt` ways. Column names must be disjoint. The right side is
    * replicated `salt`× — keep `salt` modest (8–64) and the right side the
    * smaller input. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // withColumn would silently REPLACE a user column named _salt and the
    // final drop would erase its data with no error
    TemporalJoins.requireNoReserved(left, Seq("_salt"))
    TemporalJoins.requireNoReserved(right, Seq("_salt"))
    // any per-row value works as salt (the result is salt-invariant);
    // monotonically_increasing_id is free and uniform across partitions
    val l = left.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val r = right.withColumn("_salt", explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("_salt") === r("_salt"))
      .drop("_salt")
  }
}
