package graft.cli

/** Dependency-free subset-TOML reader for CLI run configurations
  * (reference: data_diff/config.py:21-127 — TOML files with `[run.<name>]`
  * sections whose keys pre-fill CLI options; explicit CLI flags win).
  *
  * Supported syntax: `[section.path]` headers, `key = "string"`,
  * `key = 123`, `key = true|false`, `key = ["a", "b"]`, full-line and
  * trailing `#` comments. That subset covers every key the run
  * configuration uses; anything else raises.
  */
object Config {

  /** Flat map: "run.name.key" → raw string value(s). */
  def parse(text: String): Map[String, Seq[String]] = {
    var section = ""
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    val Header = """\[([A-Za-z0-9_.-]+)\]""".r
    val KeyVal = """([A-Za-z0-9_-]+)\s*=\s*(.+)""".r
    for (rawLine <- text.linesIterator) {
      val line = stripComment(rawLine).trim
      if (line.nonEmpty) line match {
        case Header(name) => section = name
        case KeyVal(k, v) =>
          val key = if (section.isEmpty) k else s"$section.$k"
          out(key) = parseValue(v.trim)
        case other => throw new IllegalArgumentException(s"cannot parse config line: $other")
      }
    }
    out.toMap
  }

  private def stripComment(line: String): String = {
    // a '#' outside quotes starts a comment
    var inQ = false
    val b = new StringBuilder
    for (c <- line) {
      if (c == '"') inQ = !inQ
      if (c == '#' && !inQ) return b.toString
      b.append(c)
    }
    b.toString
  }

  private def parseValue(v: String): Seq[String] = v match {
    case s if s.startsWith("[") && s.endsWith("]") =>
      s.substring(1, s.length - 1).split(",").map(_.trim).filter(_.nonEmpty)
        .map(e => parseValue(e).head).toSeq
    case s if s.startsWith("\"") && s.endsWith("\"") && s.length >= 2 =>
      Seq(s.substring(1, s.length - 1))
    case "true" => Seq("true")
    case "false" => Seq("false")
    case s if s.matches("-?[0-9]+") => Seq(s)
    case other => throw new IllegalArgumentException(s"cannot parse config value: $other")
  }

  /** Apply `[run.<name>]` keys as defaults under the CLI's explicit args
    * (reference: config.py `apply_config_from_file` — CLI wins). */
  def applyRun(conf: Map[String, Seq[String]], run: String, a: Cli.Args): Cli.Args = {
    def get(k: String): Option[Seq[String]] = conf.get(s"run.$run.$k")
    def one(k: String): Option[String] = get(k).flatMap(_.headOption)
    a.copy(
      sourceA = if (a.sourceA.nonEmpty) a.sourceA else one("source_a").getOrElse(""),
      sourceB = if (a.sourceB.nonEmpty) a.sourceB else one("source_b").getOrElse(""),
      keys = if (a.keys.nonEmpty) a.keys else get("key_columns").getOrElse(Nil),
      cols = if (a.cols.nonEmpty) a.cols else get("columns").getOrElse(Nil),
      ignore = if (a.ignore.nonEmpty) a.ignore else get("ignore").getOrElse(Nil),
      algorithm = if (a.algorithm.nonEmpty) a.algorithm else one("algorithm").getOrElse(""),
      updateColumn = a.updateColumn.orElse(one("update_column")),
      minAge = a.minAge.orElse(one("min_age")),
      maxAge = a.maxAge.orElse(one("max_age")),
      materialize = a.materialize.orElse(one("materialize")),
      where = a.where.orElse(one("where")),
      tableWriteLimit =
        if (a.tableWriteLimit != 1000) a.tableWriteLimit
        else one("table_write_limit").map(_.toInt).getOrElse(1000))
  }
}
