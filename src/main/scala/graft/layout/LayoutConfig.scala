package graft.layout

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.col

/** The layout's WRITE CONFIGURATION as a persisted artifact — the missing
  * piece between "a SQL user can read a graft view" and "a SQL user can
  * mutate one": `INSERT INTO` / `DELETE` / `MERGE` statements carry no
  * clustering parameters, so the dims/bits/statsCols every mutation
  * primitive needs must come from the layout itself. Every write surface
  * that KNOWS its dimension names (`df.write.format("graft")`, the
  * streaming sink, the ops CLI) records them here; SQL DML reads them
  * back. Layouts written only through the raw `DataLayout` API (dims are
  * arbitrary `Column`s there — not serializable) have no config and SQL
  * DML refuses with guidance, never guesses a clustering.
  *
  * Stored as one `java.util.Properties` file under the hidden
  * `_graft_config` dir (same invisibility contract as the logs). Writes
  * go through create-overwrite of a tiny metadata file; last writer wins,
  * which is correct — the config describes the CURRENT write shape, not a
  * version history (time travel does not need old clusterings: reads are
  * manifest-routed regardless of dims).
  */
object LayoutConfig {

  /** Name of the hidden config directory under a layout. */
  val ConfigDir = "_graft_config"

  /** Dimension names use the CLI/writer convention: `str:name` marks a
    * string column clustered via [[DataLayout.stringDim]].
    *
    * `commitMode` is the layout's DECLARED commit profile: "rename" (the
    * default — stage + rename into the dir root) or "direct" (the
    * object-store profile: output lands in exclusively-owned subdirs,
    * visibility is the manifest commit alone, no data byte is ever
    * renamed). Persisted here so every mutation surface that cannot
    * carry the flag itself — SQL INSERT/UPDATE/DELETE/MERGE, nightly
    * [[Maintenance]], [[DataLayout.purgeDeletes]] — inherits the
    * profile the layout was declared with instead of silently paying
    * S3's rename-is-a-copy tax. */
  final case class Config(dimNames: Seq[String], bits: Int,
      statsCols: Seq[String], numFiles: Int,
      commitMode: String = "rename") {
    require(commitMode == "rename" || commitMode == "direct",
      s"commitMode must be 'rename' or 'direct': $commitMode")
    def direct: Boolean = commitMode == "direct"
    def dims: Seq[Column] = dimNames.map {
      case s if s.startsWith("str:") =>
        DataLayout.stringDim(col(s.stripPrefix("str:")), bits)
      case c => col(c)
    }
  }

  private def path(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/$ConfigDir/config.properties")

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Record (or overwrite) the layout's write config — a few hundred
    * bytes of driver-side metadata I/O. */
  def record(spark: SparkSession, dir: String, c: Config): Unit = {
    require(c.dimNames.nonEmpty, "config needs at least one dimension")
    val p = new java.util.Properties()
    p.setProperty("dims", c.dimNames.mkString(","))
    p.setProperty("bits", c.bits.toString)
    p.setProperty("statsCols", c.statsCols.mkString(","))
    p.setProperty("numFiles", c.numFiles.toString)
    p.setProperty("commitMode", c.commitMode)
    val fs = fsOf(spark, dir)
    val out = fs.create(path(dir), true)
    try p.store(out, "graft layout write configuration")
    finally out.close()
  }

  /** The recorded config; None for layouts that never declared one. */
  def read(spark: SparkSession, dir: String): Option[Config] = {
    val fs = fsOf(spark, dir)
    if (!fs.exists(path(dir))) return None
    val in = fs.open(path(dir))
    val p = new java.util.Properties()
    try p.load(in) finally in.close()
    def csv(s: String) = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    for {
      dims <- Option(p.getProperty("dims")).map(csv).filter(_.nonEmpty)
      bits <- Option(p.getProperty("bits")).flatMap(s =>
        scala.util.Try(s.trim.toInt).toOption)
      stats <- Option(p.getProperty("statsCols")).map(csv)
      files <- Option(p.getProperty("numFiles")).flatMap(s =>
        scala.util.Try(s.trim.toInt).toOption)
      // absent in pre-r18 config files: those layouts declared nothing,
      // which is exactly the rename default
      mode = Option(p.getProperty("commitMode")).map(_.trim)
        .filter(m => m == "rename" || m == "direct").getOrElse("rename")
    } yield Config(dims, bits, stats, files, mode)
  }

  /** The config, or a loud refusal naming the fix — the SQL DML surface's
    * single entry point. */
  def mandatory(spark: SparkSession, dir: String): Config =
    read(spark, dir).getOrElse(throw new IllegalStateException(
      s"the layout at $dir records no write configuration (it was written " +
        "through the raw DataLayout API) — SQL DML needs the clustering " +
        "dims/bits/statsCols; write once through df.write.format(\"graft\")" +
        " or the ops CLI to record them, or use the DataLayout API"))
}
