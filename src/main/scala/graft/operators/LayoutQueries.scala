package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.layout.{Constraints, DataLayout, Maintenance, MatView, Replica}

/** Data-layout gates: the Z-order key itself (engine-exact, DuckDB
  * recomputes the interleave bit-for-bit) and the end-to-end clustered
  * write → manifest → pruned scan loop (whose RESULT is layout-independent
  * by construction — the oracle is the plain filter — while the LayoutSpec
  * asserts the pruning actually happened).
  */
object LayoutQueries {
  type Q = (SparkSession, String) => DataFrame

  /** 24-bit dimensions for orders: (o_custkey, whole cents of totalprice).
    * Cents go through DECIMAL(18,2) first — double*100 truncates vs rounds
    * differently across engines; the decimal detour is exact on both. */
  private def cents(priceCol: String) =
    (col(priceCol).cast(DecimalType(18, 2)) * 100).cast("long")

  private val Bits = 24

  /** Where the layout gate writes its clustered copy: one deterministic
    * temp dir per sf directory, overwritten on every run (the gate must be
    * re-runnable; Verify and Bench use different sf dirs so they never
    * race). */
  private def layoutDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_zorder_${math.abs(d.hashCode.toLong)}"

  val queries: Map[String, Q] = Map(
    // The Morton key itself, over every order: 24 bits of custkey
    // interleaved with 24 bits of price-cents. Pure builtin bit ops
    // (shift/and/add), one whole-stage-codegen'd projection, zero shuffles
    // beyond the final presentation sort.
    "q_zorder_key" -> ((s, d) =>
      Tables.load(s, d, "orders")
        .select(col("o_orderkey"),
          DataLayout.zOrderKey(
            Seq(col("o_custkey"), cents("o_totalprice")), Bits).as("zkey"))
        .orderBy("o_orderkey")),

    // End-to-end: write orders z-ordered by (custkey, cents), manifest the
    // per-file min/max, then answer a 2-D range predicate through the
    // manifest-pruned scan. The returned ROWS are what any scan strategy
    // must return (the oracle is the plain WHERE); the file pruning is
    // asserted in LayoutSpec (this gate at sf0.01 prunes most of its 16
    // files). At 100 TB this is the difference between reading a few
    // hundred files and reading the table.
    "q_layout_skipscan" -> ((s, d) => {
      val dir = layoutDir(d)
      DataLayout.writeZOrdered(
        Tables.load(s, d, "orders"),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey", "o_totalprice"),
        outDir = dir, numFiles = 16)
      DataLayout.skipScan(s, dir, Seq(
        ("o_custkey", 100L, 200L),
        ("o_totalprice", 50000.0, 150000.0))).df
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Incremental maintenance loop: base write (¾ of orders) → clustered
    // APPEND of the remaining delta (cost ∝ delta, base untouched) →
    // targeted compaction (only z-overlapping clusters rewrite) → pruned
    // scan. The rows any scan must return are the oracle (plain WHERE);
    // LayoutSpec asserts the structural side (overlap healed, no-op when
    // disjoint). This is the OPTIMIZE cycle a continuously-ingesting
    // 100 TB table lives by.
    "q_layout_compact" -> ((s, d) => {
      val dir = layoutDir(d) + "_inc"
      val dims = Seq(col("o_custkey"), cents("o_totalprice"))
      val orders = Tables.load(s, d, "orders")
      DataLayout.writeZOrdered(orders.where(col("o_orderkey") % 4 =!= 0),
        dims, Bits, Seq("o_custkey", "o_totalprice"), dir, numFiles = 12)
      DataLayout.appendZOrdered(orders.where(col("o_orderkey") % 4 === 0),
        dims, Bits, Seq("o_custkey", "o_totalprice"), dir, numFiles = 4)
      // target ~16 output files at ANY sf: a fixed rowsPerFile would
      // shatter a 10× table into 10× the files (the manifest read is
      // O(files) rows, not a table scan)
      val nRows = DataLayout.aliveManifest(s, dir)
        .agg(sum("n_rows")).head().getLong(0)
      DataLayout.compactZOrdered(s, dir, dims, Bits,
        Seq("o_custkey", "o_totalprice"),
        rowsPerFile = math.max(2048L, (nRows + 15) / 16))
      DataLayout.skipScan(s, dir, Seq(
        ("o_custkey", 300L, 450L),
        ("o_totalprice", 80000.0, 220000.0))).df
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Targeted delete — right-to-be-forgotten at table scale: remove a
    // 2-D key range from a clustered layout, rewriting ONLY the files
    // whose min/max envelope intersects it (LayoutSpec proves the
    // untouched files stay byte-identical). The oracle is the complement
    // WHERE — what any correct delete must leave behind.
    "q_layout_delete" -> ((s, d) => {
      val dir = layoutDir(d) + "_del"
      val dims = Seq(col("o_custkey"), cents("o_totalprice"))
      DataLayout.writeZOrdered(Tables.load(s, d, "orders"), dims, Bits,
        Seq("o_custkey", "o_totalprice"), dir, numFiles = 16)
      DataLayout.deleteWhere(s, dir, dims, Bits,
        Seq("o_custkey", "o_totalprice"),
        Seq(("o_custkey", 500L, 650L), ("o_totalprice", 0.0, 300000.0)))
      // erasure completes with the vacuum: retainVersions = 0 is the
      // explicit GDPR spelling (tombstoned files leave disk; a default
      // vacuum would retain one version of history)
      DataLayout.vacuum(s, dir, retainVersions = 0)
      DataLayout.readLayout(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Manifest-only table stats: COUNT(*), min/max, null counts answered
    // from O(files) stats rows with ZERO data I/O — the metadata-lookup
    // path a 100 TB table needs for stats-class questions. The oracle
    // computes the same numbers the hard way (a full scan); NDV columns
    // are approximate (union-merged HLL sketches) and spec-checked
    // instead of oracle-hashed.
    "q_layout_stats" -> ((s, d) => {
      val dir = layoutDir(d) + "_stats"
      DataLayout.writeZOrdered(
        Tables.load(s, d, "orders"),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey", "o_totalprice"),
        outDir = dir, numFiles = 16)
      DataLayout.tableStatsFromManifest(s, dir)
        .select("n_rows", "min_o_custkey", "max_o_custkey", "nulls_o_custkey",
          "min_o_totalprice", "max_o_totalprice", "nulls_o_totalprice")
    }),

    // MERGE INTO (CDC upsert): version 0 lacks every orderkey ≡ 3 (mod 4);
    // the delta UPDATES the status of keys ≡ 0 (mod 8) and INSERTS keys
    // ≡ 3 (mod 8). Only envelope-hit files rewrite (LayoutSpec proves the
    // targeting); the oracle is the merge's logical result — a CASE over
    // orders minus the still-missing keys.
    "q_layout_merge" -> ((s, d) => {
      val dir = layoutDir(d) + "_merge"
      val dims = Seq(col("o_custkey"), cents("o_totalprice"))
      val stats = Seq("o_custkey", "o_totalprice", "o_orderkey")
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      DataLayout.writeZOrdered(orders.where(col("o_orderkey") % 4 =!= 3),
        dims, Bits, stats, dir, numFiles = 16)
      val delta = orders.where(col("o_orderkey") % 8 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .unionByName(orders.where(col("o_orderkey") % 8 === 3))
      DataLayout.mergeInto(s, dir, dims, Bits, stats, delta,
        keyCols = Seq("o_orderkey"), numFiles = 8)
      DataLayout.readLayout(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // CDC batch apply: upserts AND delete tombstones land as ONE atomic
    // merge (one targeting pass, one rewrite, one version) — the shape a
    // Debezium-style change feed needs. Oracle: CASE for the updates,
    // WHERE for the deletes.
    "q_layout_cdc" -> ((s, d) => {
      val dir = layoutDir(d) + "_cdc"
      val dims = Seq(col("o_custkey"), cents("o_totalprice"))
      val stats = Seq("o_custkey", "o_totalprice", "o_orderkey")
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      DataLayout.writeZOrdered(orders, dims, Bits, stats, dir, numFiles = 16)
      DataLayout.mergeInto(s, dir, dims, Bits, stats,
        delta = orders.where(col("o_orderkey") % 10 === 1)
          .withColumn("o_orderstatus", lit("U")),
        keyCols = Seq("o_orderkey"), numFiles = 8,
        deleteKeys = Some(orders.where(col("o_orderkey") % 10 === 6)
          .select("o_orderkey")))
      DataLayout.readLayout(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Per-file Bloom index: point lookups on a column UNCORRELATED with
    // the clustering dims (orderkey, in a table z-ordered by custkey ×
    // price) — min/max envelopes admit every file for such a probe; the
    // 1 KiB-per-file bloom skips most of them with zero file I/O. The
    // oracle is the plain IN (what any lookup must return; one probe key
    // deliberately absent); LayoutSpec asserts the pruning + the
    // stale-index no-false-negative contract.
    "q_layout_bloom" -> ((s, d) => {
      val dir = layoutDir(d) + "_bloom"
      DataLayout.writeZOrdered(
        Tables.load(s, d, "orders"),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey", "o_totalprice"),
        outDir = dir, numFiles = 16)
      DataLayout.buildBloomIndex(s, dir, "o_orderkey")
      DataLayout.bloomScan(s, dir, "o_orderkey",
        Seq(3L, 17L, 256L, 999L, 1200L, 10000000L)).df
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Time travel + churn-proportional version diff, end to end: version 0
    // writes ¾ of orders, version 1 appends the rest, version 2 deletes a
    // key range. The gate reads version 1 (time travel: the full table as
    // it stood) UNION-style alongside diffVersions(1→2) rows — the rsync
    // payoff: the v1→v2 diff never reads files both versions share. The
    // oracle rebuilds both from plain SQL over orders.
    "q_layout_timetravel" -> ((s, d) => {
      val dir = layoutDir(d) + "_tt"
      val dims = Seq(col("o_custkey"), cents("o_totalprice"))
      val stats = Seq("o_custkey", "o_totalprice")
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      DataLayout.writeZOrdered(orders.where(col("o_orderkey") % 4 =!= 0),
        dims, Bits, stats, dir, numFiles = 12)                         // v0
      DataLayout.appendZOrdered(orders.where(col("o_orderkey") % 4 === 0),
        dims, Bits, stats, dir, numFiles = 4)                          // v1
      DataLayout.deleteWhere(s, dir, dims, Bits, stats,
        Seq(("o_custkey", 100L, 220L)))                                // v2
      val v1 = DataLayout.readLayout(s, dir, 1L)
        .select(lit("v1").as("state"), col("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
      val d12 = DataLayout.diffVersions(s, dir, 1L, 2L,
        Seq("o_orderkey"), Seq("o_custkey", "o_orderstatus", "o_totalprice")).df
        .select(concat(lit("diff"), col("sign")).as("state"),
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      v1.unionByName(d12).orderBy("state", "o_orderkey")
    }),

    // The Catalyst-integrated FileIndex: the layout read as a DataFrame
    // whose QUERY predicates prune files inside planning — no intervals
    // or keys handed to a helper API; the WHERE itself reaches the
    // manifest (and the o_orderkey bloom) via GraftFileIndex.listFiles.
    // The oracle is the plain WHERE over orders (pruning must be
    // invisible to results); FileIndexSpec asserts the files actually
    // skipped, bloom rejection, snapshot isolation, and the
    // unknown-shape full-scan fallback.
    "q_layout_sql" -> ((s, d) => {
      val dir = layoutDir(d) + "_fi"
      DataLayout.writeZOrdered(
        Tables.load(s, d, "orders"),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey", "o_totalprice", "o_orderkey"),
        outDir = dir, numFiles = 16)
      DataLayout.buildBloomIndex(s, dir, "o_orderkey")
      val (ldf, _) = graft.layout.GraftFileIndex.readLayoutIndexed(s, dir)
      // 2-D range (envelope) + a point-lookup disjunct (bloom): both
      // prune; the union shape exercises Or-rewrite + IN-rewrite at once
      ldf.where((col("o_custkey").between(100L, 220L) &&
          col("o_totalprice") > 100000.0) ||
          col("o_orderkey").isin(3L, 999L, 10000000L))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Row-level change feed (the CDF read side of the layout): v0 writes
    // ¾ of orders, v1 appends the rest, v2 deletes a key range — the feed
    // over (0, 2] must emit exactly the '+' rows v1 appended and the '-'
    // rows v2 deleted, each stamped with its version, at churn cost
    // (files alive across a step are never read). The oracle replays both
    // steps in SQL; VersionSpec pins the zero-row compaction step.
    "q_layout_changefeed" -> ((s, d) => {
      val dir = layoutDir(d) + "_cf"
      val dims = Seq(col("o_custkey"), cents("o_totalprice"))
      val stats = Seq("o_custkey", "o_totalprice")
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      DataLayout.writeZOrdered(orders.where(col("o_orderkey") % 4 =!= 0),
        dims, Bits, stats, dir, numFiles = 12)                         // v0
      DataLayout.appendZOrdered(orders.where(col("o_orderkey") % 4 === 0),
        dims, Bits, stats, dir, numFiles = 4)                          // v1
      DataLayout.deleteWhere(s, dir, dims, Bits, stats,
        Seq(("o_custkey", 100L, 220L)))                                // v2
      DataLayout.changeFeed(s, dir, 0L, 2L, Seq("o_orderkey"),
          Seq("o_custkey", "o_totalprice"))
        .orderBy("version", "sign", "o_orderkey")
    }),

    // Deletion vectors — the soft-delete fast path: two overlapping DV
    // deletes land as two versions of pure coordinate appends (LayoutSpec
    // proves every data file stays byte-identical and the second delete
    // never double-counts); the manifest-routed read applies the mask via
    // one anti join. The oracle is the conjunction of the complements —
    // what any correct delete must leave behind.
    "q_layout_dv" -> ((s, d) => {
      val dir = layoutDir(d) + "_dv"
      DataLayout.writeZOrdered(
        Tables.load(s, d, "orders"),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey", "o_totalprice"),
        outDir = dir, numFiles = 16)
      DataLayout.deleteVectors(s, dir, Seq(
        ("o_custkey", 500L, 650L), ("o_totalprice", 0.0, 300000.0)))  // v1
      DataLayout.deleteVectors(s, dir, Seq(("o_custkey", 600L, 700L))) // v2
      DataLayout.readLayout(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // The DV lifecycle completed: soft delete → purgeDeletes (rewrite ONLY
    // the DV'd files, masked) → vacuum (soft-deleted bytes leave disk) —
    // the GDPR-complete spelling, read back through a manifest-pruned
    // skipScan. Oracle: range ∧ complement-of-delete.
    "q_layout_dv_purge" -> ((s, d) => {
      val dir = layoutDir(d) + "_dvp"
      val dims = Seq(col("o_custkey"), cents("o_totalprice"))
      val stats = Seq("o_custkey", "o_totalprice")
      DataLayout.writeZOrdered(Tables.load(s, d, "orders"),
        dims, Bits, stats, dir, numFiles = 16)
      DataLayout.deleteVectors(s, dir, Seq(("o_custkey", 500L, 650L)))
      DataLayout.purgeDeletes(s, dir, dims, Bits, stats)
      DataLayout.vacuum(s, dir, retainVersions = 0)
      DataLayout.skipScan(s, dir, Seq(("o_custkey", 400L, 800L))).df
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Version diff across a DV step: a soft delete moves NO files, so the
    // naive shared-file shortcut would report an empty diff — the engine
    // must pull DV-churned files onto both sides (each masked at its own
    // version) and emit exactly the '-' rows the delete masked, at churn
    // cost (VersionSpec pins the filesUnchanged count).
    "q_layout_dv_diff" -> ((s, d) => {
      val dir = layoutDir(d) + "_dvd"
      val dims = Seq(col("o_custkey"), cents("o_totalprice"))
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      DataLayout.writeZOrdered(orders, dims, Bits,
        Seq("o_custkey", "o_totalprice"), dir, numFiles = 16)            // v0
      DataLayout.deleteVectors(s, dir, Seq(("o_custkey", 100L, 220L)))   // v1
      DataLayout.diffVersions(s, dir, 0L, 1L,
          Seq("o_orderkey"), Seq("o_custkey", "o_totalprice")).df
        .orderBy("o_orderkey")
    }),

    // Incremental view maintenance: a count/sum/min/max-per-group view
    // materialized once, then the layout mutates (append + DV delete) and
    // ONE churn-cost refresh — change-feed deltas for count/sum, a
    // dirty-group-only base pass for clipped minima — must land the view
    // on exactly what a from-scratch GROUP BY of the final table computes
    // (the oracle). Cents as BIGINT keep incremental arithmetic exact.
    "q_layout_ivm" -> ((s, d) => {
      val dir = layoutDir(d) + "_ivm"
      val view = dir + "_view"
      val c = cents("o_totalprice").as("o_price_cents")
      def prep(df: org.apache.spark.sql.DataFrame) =
        df.select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          c)
      val orders = Tables.load(s, d, "orders")
      DataLayout.writeZOrdered(
        prep(orders.where(col("o_orderkey") % 3 =!= 0)),
        Seq(col("o_custkey"), col("o_price_cents")), Bits,
        statsCols = Seq("o_custkey"), outDir = dir, numFiles = 16)     // v0
      MatView.materialize(s, dir, view, Seq("o_orderpriority"),
        Seq("o_price_cents"), Seq("o_orderkey"))
      DataLayout.appendZOrdered(
        prep(orders.where(col("o_orderkey") % 3 === 0)),
        Seq(col("o_custkey"), col("o_price_cents")), Bits,
        statsCols = Seq("o_custkey"), outDir = dir, numFiles = 4)      // v1
      DataLayout.deleteVectors(s, dir, Seq(("o_custkey", 400L, 700L))) // v2
      MatView.refresh(s, view)
      MatView.read(s, view).orderBy("o_orderpriority")
    }),

    // Shallow clone: a zero-copy dev branch of the layout (manifest-only
    // commit), which then DIVERGES — a targeted delete on the clone
    // rewrites shared files locally and never touches the source. The
    // returned rows are the clone's; CloneSpec pins that the source stays
    // byte-identical and that clone-side vacuum spares shared bytes.
    "q_layout_clone" -> ((s, d) => {
      val src = layoutDir(d) + "_clsrc"
      val dst = layoutDir(d) + "_cldst"
      DataLayout.writeZOrdered(
        Tables.load(s, d, "orders"),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey", "o_totalprice"), src, numFiles = 16)
      DataLayout.deleteVectors(s, src, Seq(("o_custkey", 0L, 150L)))
      DataLayout.cloneLayout(s, src, dst)
      DataLayout.deleteWhere(s, dst, Seq(col("o_custkey"), cents("o_totalprice")),
        Bits, Seq("o_custkey", "o_totalprice"),
        Seq(("o_custkey", 1200L, 1500L)))
      DataLayout.readLayout(s, dst)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Schema evolution: the second half of orders lands WITH a column the
    // first half never had. No old file is rewritten; the reader resolves
    // the recorded merged schema in O(1) metadata and the scan fills the
    // missing column with NULL on pre-evolution rows — exactly the CASE
    // the oracle states. SchemaEvolutionSpec pins time travel (v0 keeps
    // the narrow schema), type-change refusal, and rewrite healing.
    "q_layout_schema_evo" -> ((s, d) => {
      val dir = layoutDir(d) + "_evo"
      val orders = Tables.load(s, d, "orders")
      DataLayout.writeZOrdered(
        orders.where(col("o_orderkey") % 2 === 1)
          .select("o_orderkey", "o_custkey", "o_totalprice"),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey"), outDir = dir, numFiles = 8)
      DataLayout.appendZOrdered(
        orders.where(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey"), outDir = dir, numFiles = 4)
      DataLayout.readLayout(s, dir).orderBy("o_orderkey")
    }),

    // CDC replication: a physically independent replica (clustered by ITS
    // OWN dims) seeded once, then the source churns (append + DV delete)
    // and ONE sync ships exactly the churn — change-feed rows collapsed
    // last-event-wins into one envelope-targeted merge. The replica's
    // rows must equal the source's final table, which the oracle states
    // directly over orders. ReplicaSpec pins churn-cost and idempotence.
    "q_layout_replica" -> ((s, d) => {
      val src = layoutDir(d) + "_repsrc"
      val dst = layoutDir(d) + "_repdst"
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      DataLayout.writeZOrdered(
        orders.where(col("o_orderkey") % 3 =!= 0),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey"), outDir = src, numFiles = 16)   // v0
      Replica.init(s, src, dst, Seq(col("o_orderkey")), Bits,
        Seq("o_orderkey"), Seq("o_orderkey"), numFiles = 8)
      DataLayout.appendZOrdered(
        orders.where(col("o_orderkey") % 3 === 0),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey"), outDir = src, numFiles = 4)    // v1
      DataLayout.deleteVectors(s, src, Seq(("o_custkey", 900L, 1100L))) // v2
      Replica.sync(s, dst, Seq(col("o_orderkey")), Bits,
        Seq("o_orderkey"), numFiles = 4)
      DataLayout.readLayout(s, dst).orderBy("o_orderkey")
    }),

    // CHECK constraints: invariants enforced at the write seam. A layout
    // seeded with conforming rows gains two constraints; a permissive
    // append of the WHOLE table then quarantines exactly the violating
    // rows — returned here with the names of the constraints each row
    // failed, which the oracle restates as plain CASE logic over orders.
    // ConstraintsSpec pins the strict-mode refusals (append/merge/add) and
    // the SQL NULL-passes semantics.
    "q_layout_constraints" -> ((s, d) => {
      val dir = layoutDir(d) + "_ck"
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // clean slate for re-runs: the constraint log survives overwrite by
      // design, so the gate resets it explicitly
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir, Constraints.ConstraintsDir), true)
      DataLayout.writeZOrdered(
        orders.where(col("o_custkey") % 7 =!= 0 && col("o_totalprice") < 300000),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey"), outDir = dir, numFiles = 8)
      Constraints.add(s, dir, "c_mod", "o_custkey % 7 <> 0")
      Constraints.add(s, dir, "c_cap", "o_totalprice < 300000")
      Constraints.appendPermissive(
        orders.where(col("o_custkey") % 7 === 0 || col("o_totalprice") >= 300000),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey"), dir = dir, numFiles = 4)
        .select("o_orderkey", "o_custkey", "o_totalprice", "violated")
        .orderBy("o_orderkey")
    }),

    // String z-dimension: documents clustered by (lang, n_chars) — the
    // language is a STRING, packed byte-order-monotone by stringDim, so
    // the manifest's plain string min/max envelopes prune the same way a
    // long dim's do. The oracle is the plain WHERE; LayoutSpec pins the
    // monotonicity law and the actual file skipping.
    "q_layout_stringdim" -> ((s, d) => {
      val dir = layoutDir(d) + "_sd"
      val docs = Tables.load(s, d, "documents")
        .select("doc_id", "lang", "n_chars")
      DataLayout.writeZOrdered(docs,
        Seq(DataLayout.stringDim(col("lang"), 16), col("n_chars")), 16,
        statsCols = Seq("lang", "n_chars"), outDir = dir, numFiles = 8)
      DataLayout.skipScan(s, dir, Seq(
        ("lang", "en", "en"), ("n_chars", 200L, 1500L))).df
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // Dynamic file pruning: "join the fact layout to a filtered dimension"
    // decided file-first — the manifest broadcast against the dimension's
    // keys picks the files any requested key can live in; only those are
    // read, one semi-join drops envelope false positives. The oracle is
    // the plain IN-subquery join. LayoutSpec pins that the pruning
    // actually skipped files.
    "q_layout_dfp" -> ((s, d) => {
      val dir = layoutDir(d) + "_dfp"
      DataLayout.writeZOrdered(
        Tables.load(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice"),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey"), outDir = dir, numFiles = 16)
      val keys = Tables.load(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey"))
      DataLayout.semiJoinScan(s, dir, keys, "o_custkey").df
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // JOIN-driven dynamic file pruning with NO helper API: a plain inner
    // join of the indexed layout against a filtered dimension — the
    // JoinPruning rule eagerly evaluates the (small, deterministic) build
    // side's key domain at optimization time and re-injects it as a
    // literal IN/range the manifest envelope prunes on. q_layout_dfp is
    // the explicit-helper spelling of the same operation; this is what a
    // SQL user writes. Oracle: the plain join. JoinPruningSpec pins the
    // file skipping, the guards, and the empty/nondeterministic cases.
    "q_layout_join_prune" -> ((s, d) => {
      val dir = layoutDir(d) + "_jp"
      DataLayout.writeZOrdered(
        Tables.load(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice"),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey"), outDir = dir, numFiles = 16)
      val (fact, _) = graft.layout.GraftFileIndex.readLayoutIndexed(s, dir)
      val dim = Tables.load(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING" && col("c_custkey") <= 300)
        .select(col("c_custkey"), col("c_acctbal"))
      fact.join(dim, fact("o_custkey") === dim("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_acctbal")
        .orderBy("o_orderkey")
    }),

    // File-granular diff between TWO layouts — the nightly replica-verify
    // at 100 TB: layout B is a zero-copy clone of A plus one localized
    // delete; the cross-layout diff matches files by the CONTENT
    // FINGERPRINT every write stamps into the manifest and reads ONLY the
    // files that actually differ (LayoutDiff2Spec pins the pruning, the
    // zero-read clean path, and the different-clustering fast path). The
    // oracle restates the delete's logical delta: '-' rows for what B
    // dropped.
    "q_layout_diff2" -> ((s, d) => {
      val a = layoutDir(d) + "_d2a"
      val b = layoutDir(d) + "_d2b"
      val dims = Seq(col("o_custkey"), cents("o_totalprice"))
      val stats = Seq("o_custkey", "o_totalprice")
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      DataLayout.writeZOrdered(orders, dims, Bits, stats, a, numFiles = 16)
      DataLayout.cloneLayout(s, a, b)
      DataLayout.deleteWhere(s, b, dims, Bits, stats,
        Seq(("o_custkey", 100L, 200L)))
      DataLayout.diffLayouts(s, a, b, Seq("o_orderkey"),
          Seq("o_custkey", "o_orderstatus", "o_totalprice")).df
        .orderBy("sign", "o_orderkey")
    }),

    // SQL-only DML lifecycle on a `USING graft` view: df.write records
    // the layout's write config; INSERT INTO rides the native
    // InsertableRelation (a manifested, z-clustered, OCC-committed
    // append — never InsertIntoHadoopFsRelationCommand's raw parquet
    // drop); DELETE FROM lands as deletion vectors + an immediate
    // file-targeted purge; MERGE INTO is the envelope-targeted upsert.
    // The final read goes back through the SAME SQL view. Oracle: the
    // DuckDB replay of the same four statements.
    "q_layout_sql_dml" -> ((s, d) => {
      val dir = layoutDir(d) + "_sqldml"
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val mod = pmod(col("o_orderkey"), lit(4))
      orders.where(mod < 3).write.format("graft").mode("overwrite")
        .option("dims", "o_custkey").option("bits", Bits.toString)
        .option("statsCols", "o_custkey,o_orderkey,o_totalprice")
        .option("numFiles", "12").save(dir)
      s.sql("DROP VIEW IF EXISTS sqldml_v")
      s.sql(s"CREATE TEMPORARY VIEW sqldml_v USING graft OPTIONS (path '$dir')")
      orders.where(mod === 3).createOrReplaceTempView("sqldml_delta")
      s.sql("INSERT INTO sqldml_v SELECT * FROM sqldml_delta")
      graft.layout.GraftSql(s,
        "DELETE FROM sqldml_v WHERE o_custkey BETWEEN 300 AND 400")
      orders.where(col("o_orderkey").between(100, 2000))
        .withColumn("o_orderstatus", lit("M"))
        .createOrReplaceTempView("sqldml_src")
      graft.layout.GraftSql(s,
        """MERGE INTO sqldml_v USING sqldml_src src
          |ON sqldml_v.o_orderkey = src.o_orderkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // UPDATE: one atomic version rewriting only match-carrying files
      graft.layout.GraftSql(s,
        "UPDATE sqldml_v SET o_orderstatus = 'U' " +
          "WHERE o_custkey BETWEEN 10 AND 20")
      // the GENERAL merge shape (r18): conditional DELETE + partial-SET
      // UPDATE arms in one statement — a real CDC batch's first merge,
      // which the canonical-only surface refused in r17. Lands as ONE
      // version through the derived-source rewrite.
      orders.where(col("o_orderkey").between(2100, 2400))
        .select(col("o_orderkey"),
          when(col("o_orderkey") <= 2200, lit("D")).otherwise(lit("U"))
            .as("op"))
        .createOrReplaceTempView("sqldml_cdc")
      graft.layout.GraftSql(s,
        """MERGE INTO sqldml_v t USING sqldml_cdc c
          |ON t.o_orderkey = c.o_orderkey
          |WHEN MATCHED AND c.op = 'D' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'C'""".stripMargin)
      s.sql("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
              |FROM sqldml_v ORDER BY o_orderkey""".stripMargin)
    }),

    // Cross-layout diff between DIFFERENTLY-CLUSTERED layouts — the
    // checksum-bisection path: clustering differs, so no file fingerprint
    // can cancel and the dirty sets are both whole tables; the differ
    // segments the shared o_orderkey space from manifest envelopes,
    // aggregates one additive checksum per segment per side (map-side
    // combined, no row shuffle), and row-diffs ONLY the mismatched
    // segments — the reference's hashdiff bisection
    // (data_diff/hashdiff_tables.py:169-264) applied between layouts.
    // LayoutDiff2Spec pins the mechanics (segmentsDirty small,
    // filesRowDiffed pruned on the key-clustered side).
    "q_layout_diff2_mixed" -> ((s, d) => {
      val a = layoutDir(d) + "_d2xa"
      val b = layoutDir(d) + "_d2xb"
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      DataLayout.writeZOrdered(orders,
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        Seq("o_custkey", "o_totalprice", "o_orderkey"), a, numFiles = 16)
      DataLayout.writeZOrdered(orders, Seq(col("o_orderkey")), Bits,
        Seq("o_orderkey"), b, numFiles = 12)
      DataLayout.deleteWhere(s, b, Seq(col("o_orderkey")), Bits,
        Seq("o_orderkey"), Seq(("o_orderkey", 1000L, 3000L)))
      DataLayout.diffLayouts(s, a, b, Seq("o_orderkey"),
          Seq("o_custkey", "o_orderstatus", "o_totalprice")).df
        .orderBy("sign", "o_orderkey")
    }),

    // COMPOUND-KEY bisected diff (r18): the diff key leads with
    // o_orderstatus — three distinct values, the degenerate case for
    // leading-key-only segmentation (every row pools into ~3 ordinal
    // points and the row diff re-degrades to the whole table). The
    // (status, orderkey) z-mesh keeps subdividing on the second key, so
    // a localized orderkey-range mutation still confines the row-level
    // JoinDiff to few segments and few files on the orderkey-clustered
    // side — the requires pin exactly that; the oracle pins the rows.
    "q_layout_diff2_compound" -> ((s, d) => {
      val a = layoutDir(d) + "_d2ca"
      val b = layoutDir(d) + "_d2cb"
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      DataLayout.writeZOrdered(orders,
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        Seq("o_orderstatus", "o_orderkey", "o_custkey"), a, numFiles = 16)
      DataLayout.writeZOrdered(orders, Seq(col("o_orderkey")), Bits,
        Seq("o_orderstatus", "o_orderkey"), b, numFiles = 12)
      DataLayout.deleteWhere(s, b, Seq(col("o_orderkey")), Bits,
        Seq("o_orderstatus", "o_orderkey"),
        Seq(("o_orderkey", 1000L, 2000L)))
      val r = DataLayout.diffLayouts(s, a, b,
        Seq("o_orderstatus", "o_orderkey"),
        Seq("o_custkey", "o_totalprice"))
      require(r.filesRowDiffedA >= 0,
        s"compound bisection did not engage: $r")
      require(r.filesRowDiffedB < r.filesReadB,
        s"row diff not envelope-confined on the clustered side: $r")
      r.df.orderBy("sign", "o_orderkey")
    }),

    // THREE-key bisected diff (r19): the key leads with TWO
    // low-cardinality columns — (status, priority) covers ~15 points, so
    // the 2-key z-mesh saturates exactly the way the leading-key-only
    // segmentation did in r17 and the row diff re-degrades to the whole
    // table. The 3×18-bit (status, priority, orderkey) mesh keeps
    // subdividing on the third key; the require pins that the
    // orderkey-clustered side's row diff stays envelope-confined.
    "q_layout_diff3_compound" -> ((s, d) => {
      val a = layoutDir(d) + "_d3ca"
      val b = layoutDir(d) + "_d3cb"
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_orderpriority", "o_totalprice")
      DataLayout.writeZOrdered(orders,
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        Seq("o_orderstatus", "o_orderpriority", "o_orderkey", "o_custkey"),
        a, numFiles = 16)
      DataLayout.writeZOrdered(orders, Seq(col("o_orderkey")), Bits,
        Seq("o_orderstatus", "o_orderpriority", "o_orderkey"),
        b, numFiles = 12)
      DataLayout.deleteWhere(s, b, Seq(col("o_orderkey")), Bits,
        Seq("o_orderstatus", "o_orderpriority", "o_orderkey"),
        Seq(("o_orderkey", 1000L, 2000L)))
      val r = DataLayout.diffLayouts(s, a, b,
        Seq("o_orderstatus", "o_orderpriority", "o_orderkey"),
        Seq("o_custkey", "o_totalprice"))
      require(r.filesRowDiffedA >= 0,
        s"3-key compound bisection did not engage: $r")
      require(r.filesRowDiffedB < r.filesReadB,
        s"row diff not envelope-confined on the clustered side: $r")
      r.df.orderBy("sign", "o_orderkey")
    }),

    // Full re-cluster by NEW dimensions (query patterns changed): the
    // table first lands z-ordered by (custkey, price), then reclusters by
    // orderkey as one new version; a 1-D orderkey range through skipScan
    // must prune well on the NEW layout and return the plain-WHERE rows.
    // LayoutSpec pins content preservation + the pruning flip.
    "q_layout_recluster" -> ((s, d) => {
      val dir = layoutDir(d) + "_rc"
      DataLayout.writeZOrdered(
        Tables.load(s, d, "orders"),
        Seq(col("o_custkey"), cents("o_totalprice")), Bits,
        statsCols = Seq("o_custkey", "o_totalprice"),
        outDir = dir, numFiles = 16)
      DataLayout.recluster(s, dir, Seq(col("o_orderkey")), 24,
        statsCols = Seq("o_orderkey"), numFiles = 16)
      DataLayout.skipScan(s, dir, Seq(("o_orderkey", 1000L, 5000L))).df
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // NIGHTLY MAINTENANCE as a policy: a day of abuse (overlapping delta,
    // soft deletes, four trickle appends) leaves every debt class behind;
    // Maintenance.run assesses from metadata, fires purge + overlap
    // compaction + bin-pack + vacuum in dependency order, and the table's
    // LOGICAL content must be untouched — the oracle is the same rows a
    // SQL replay of the mutations produces, and the skip-scan at the end
    // proves the result is still manifest-pruned.
    "q_layout_maintain" -> ((s, d) => {
      val dir = layoutDir(d) + "_maint"
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val dims = Seq(col("o_custkey"), cents("o_totalprice"))
      val stats = Seq("o_custkey", "o_totalprice")
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val mod = pmod(col("o_orderkey"), lit(8))
      DataLayout.writeZOrdered(orders.where(mod < 4), dims, Bits, stats,
        dir, numFiles = 12)                                           // base
      DataLayout.appendZOrdered(orders.where(mod === 4), dims, Bits, stats,
        dir, numFiles = 12)                     // overlapping delta: z-debt
      for (m <- 5 to 7)                        // trickle: small-file debt
        DataLayout.appendZOrdered(orders.where(mod === m), dims, Bits, stats,
          dir, numFiles = 4)
      // the soft delete comes LAST so it masks every residue's rows —
      // an earlier delete would be (correctly) un-deleted by later appends.
      // The key range must be POPULATED AT EVERY SF (custkeys reach only
      // 150 at sf0.001 — a higher range makes zero DV debt there, the
      // purge stays idle, and the every-arm-fired require below trips)
      DataLayout.deleteVectors(s, dir, Seq(("o_custkey", 50L, 120L))) // DV debt
      // target file size ∝ table (table/16): the debt SHAPE — full base
      // files, small overlapping delta, small trickle — is then the same
      // at every sf, so each policy arm is due at every scale
      val rowsPerFile = math.max(1024L, orders.count() / 16L)
      val rep = Maintenance.run(s, dir, dims, Bits, stats,
        Maintenance.Policy(rowsPerFile = rowsPerFile, minReclaimableFiles = 1,
          retainVersions = 1))
      require(rep.purged.isDefined && rep.overlapCompacted.isDefined &&
        rep.vacuumed.isDefined, s"maintenance skipped a due step: $rep")
      DataLayout.skipScan(s, dir, Seq(("o_custkey", 1L, 800L))).df
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // The SQL WRITE surface end-to-end: orders land through
    // df.write.format("graft") (overwrite bootstraps v0, append adds v1),
    // and the result reads back through a USING-graft DDL view with a
    // pruning WHERE — no DataLayout API call touches the data path. The
    // oracle is the plain filtered scan: it matches iff SaveMode mapped
    // correctly onto the version log and the view planned the manifest.
    "q_layout_sql_writer" -> ((s, d) => {
      val dir = layoutDir(d) + "_sqlw"
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      def write(df: DataFrame, mode: String) =
        df.write.format("graft").mode(mode)
          .option("dims", "o_custkey")
          .option("statsCols", "o_custkey,o_orderkey")
          .option("numFiles", 8).save(dir)
      write(orders.where(pmod(col("o_orderkey"), lit(2)) === 0), "overwrite")
      write(orders.where(pmod(col("o_orderkey"), lit(2)) === 1), "append")
      write(orders.limit(10), "ignore") // no-op on a live layout
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW sqlw USING graft " +
        s"OPTIONS (path '$dir')")
      s.sql("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
              |FROM sqlw WHERE o_custkey BETWEEN 200 AND 900
              |ORDER BY o_orderkey""".stripMargin)
    }),

    // EXACTLY-ONCE ingestion through transaction markers (the streaming
    // sink's commit discipline, driven batch-by-batch): orders land in
    // three txn-marked appends, with batch id 1 REPLAYED in between —
    // once with identical data (a restart recovery) and once with
    // DIFFERENT data under the stale id (a zombie writer) — and both
    // replays must be skipped whole. The oracle is the plain aggregate
    // over orders: it matches iff each batch landed exactly once.
    "q_layout_txn_writer" -> ((s, d) => {
      val dir = layoutDir(d) + "_txn"
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val orders = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val dims = Seq(col("o_custkey"), cents("o_totalprice"))
      def part(m: Int) = orders.where(pmod(col("o_orderkey"), lit(3)) === m)
      def append(batch: Long, df: DataFrame): Boolean =
        DataLayout.appendZOrderedTxn(df, dims, Bits,
          Seq("o_custkey", "o_totalprice"), dir, numFiles = 4,
          txnApp = "gate_txn", txnBatch = batch)
      append(0L, part(0))
      append(1L, part(1))
      append(1L, part(1)) // restart replay: same batch, must be skipped
      append(1L, part(2)) // zombie under a stale id: must be skipped too
      append(2L, part(2))
      DataLayout.readLayout(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(cents("o_totalprice")).cast("long").as("sum_price_cents"))
        .orderBy("o_orderstatus")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_zorder_key" ->
      s"""WITH b AS (
         |  SELECT o_orderkey, o_custkey AS x,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
         |  FROM orders)
         |SELECT o_orderkey,
         |  CAST(list_sum([ (((x >> j) & 1) << (2*j + 1)) + (((y >> j) & 1) << (2*j))
         |                  for j in range(0, $Bits) ]) AS BIGINT) AS zkey
         |FROM b ORDER BY o_orderkey""".stripMargin,

    "q_layout_skipscan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_custkey BETWEEN 100 AND 200
        |  AND o_totalprice BETWEEN 50000.0 AND 150000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_compact" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_custkey BETWEEN 300 AND 450
        |  AND o_totalprice BETWEEN 80000.0 AND 220000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_delete" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE NOT (o_custkey BETWEEN 500 AND 650
        |           AND o_totalprice BETWEEN 0.0 AND 300000.0)
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_bloom" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey IN (3, 17, 256, 999, 1200, 10000000)
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_cdc" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 10 = 1 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice
        |FROM orders
        |WHERE o_orderkey % 10 <> 6
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_stats" ->
      """SELECT count(*) AS n_rows,
        |  min(o_custkey) AS min_o_custkey,
        |  max(o_custkey) AS max_o_custkey,
        |  count(*) FILTER (WHERE o_custkey IS NULL) AS nulls_o_custkey,
        |  min(o_totalprice) AS min_o_totalprice,
        |  max(o_totalprice) AS max_o_totalprice,
        |  count(*) FILTER (WHERE o_totalprice IS NULL) AS nulls_o_totalprice
        |FROM orders""".stripMargin,

    "q_layout_merge" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 8 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice
        |FROM orders
        |WHERE o_orderkey % 8 <> 7
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_timetravel" ->
      """SELECT 'v1' AS state, o_orderkey, o_custkey, o_totalprice FROM orders
        |UNION ALL
        |SELECT 'diff-' AS state, o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey BETWEEN 100 AND 220
        |ORDER BY state, o_orderkey""".stripMargin,

    "q_layout_sql" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE (o_custkey BETWEEN 100 AND 220 AND o_totalprice > 100000)
        |   OR o_orderkey IN (3, 999, 10000000)
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_changefeed" ->
      """SELECT '+' AS sign, CAST(1 AS BIGINT) AS version,
        |       o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey % 4 = 0
        |UNION ALL
        |SELECT '-' AS sign, CAST(2 AS BIGINT) AS version,
        |       o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_custkey BETWEEN 100 AND 220
        |ORDER BY version, sign, o_orderkey""".stripMargin,

    "q_layout_join_prune" ->
      """SELECT o_orderkey, o_custkey, c_acctbal
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey <= 300
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_diff2" ->
      """SELECT '-' AS sign, o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_custkey BETWEEN 100 AND 200
        |ORDER BY sign, o_orderkey""".stripMargin,

    "q_layout_sql_dml" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey BETWEEN 2201 AND 2400 THEN 'C'
        |       WHEN o_custkey BETWEEN 10 AND 20 THEN 'U'
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice
        |FROM (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders
        |  WHERE NOT (o_custkey BETWEEN 300 AND 400)
        |    AND o_orderkey NOT BETWEEN 100 AND 2000
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus, o_totalprice
        |  FROM orders
        |  WHERE o_orderkey BETWEEN 100 AND 2000
        |)
        |WHERE o_orderkey NOT BETWEEN 2100 AND 2200
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_diff2_mixed" ->
      """SELECT '-' AS sign, o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey BETWEEN 1000 AND 3000
        |ORDER BY sign, o_orderkey""".stripMargin,

    "q_layout_diff2_compound" ->
      """SELECT '-' AS sign, o_orderstatus, o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey BETWEEN 1000 AND 2000
        |ORDER BY sign, o_orderkey""".stripMargin,

    "q_layout_diff3_compound" ->
      """SELECT '-' AS sign, o_orderstatus, o_orderpriority, o_orderkey,
        |  o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey BETWEEN 1000 AND 2000
        |ORDER BY sign, o_orderkey""".stripMargin,

    "q_layout_recluster" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey BETWEEN 1000 AND 5000
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_sql_writer" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_custkey BETWEEN 200 AND 900
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_maintain" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_custkey BETWEEN 1 AND 800
        |  AND NOT (o_custkey BETWEEN 50 AND 120)
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_txn_writer" ->
      """SELECT o_orderstatus,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |       AS BIGINT) AS sum_price_cents
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_layout_dv" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE NOT (o_custkey BETWEEN 500 AND 650
        |           AND o_totalprice BETWEEN 0.0 AND 300000.0)
        |  AND NOT (o_custkey BETWEEN 600 AND 700)
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_dv_purge" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_custkey BETWEEN 400 AND 800
        |  AND NOT (o_custkey BETWEEN 500 AND 650)
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_dv_diff" ->
      """SELECT '-' AS sign, o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey BETWEEN 100 AND 220
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_ivm" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_rows,
        |  count(c) AS n_o_price_cents,
        |  CAST(sum(c) AS BIGINT) AS sum_o_price_cents,
        |  min(c) AS min_o_price_cents,
        |  max(c) AS max_o_price_cents
        |FROM (SELECT o_orderpriority, o_custkey,
        |        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |      FROM orders)
        |WHERE NOT (o_custkey BETWEEN 400 AND 700)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_layout_clone" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE NOT (o_custkey BETWEEN 0 AND 150)
        |  AND NOT (o_custkey BETWEEN 1200 AND 1500)
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_schema_evo" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CASE WHEN o_orderkey % 2 = 0 THEN o_orderpriority END AS o_orderpriority
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_replica" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE NOT (o_custkey BETWEEN 900 AND 1100)
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_stringdim" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE lang >= 'en' AND lang <= 'en'
        |  AND n_chars BETWEEN 200 AND 1500
        |ORDER BY doc_id""".stripMargin,

    "q_layout_dfp" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,

    "q_layout_constraints" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  concat_ws(',',
        |    CASE WHEN o_custkey % 7 = 0 THEN 'c_mod' END,
        |    CASE WHEN o_totalprice >= 300000 THEN 'c_cap' END) AS violated
        |FROM orders
        |WHERE o_custkey % 7 = 0 OR o_totalprice >= 300000
        |ORDER BY o_orderkey""".stripMargin,
  )
}
