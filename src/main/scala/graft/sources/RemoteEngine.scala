package graft.sources

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession

/** A handle to an external SQL engine that pushdown mode ships checksum /
  * leaf-fetch queries to. The reference reaches engines through per-DB
  * driver modules (data_diff/databases/&#42;.py `_query` / `query_table_schema`);
  * here the contract is one method — results come back as text because every
  * pushed query selects text-rendered (normalized) values by construction.
  */
trait RemoteEngine extends AutoCloseable {
  def profile: SourceProfile

  /** Execute SQL remotely; each row is a sequence of nullable strings. */
  def query(sql: String): Seq[Seq[Option[String]]]

  /** Execute a DML/DDL statement remotely (the repair path). Engines whose
    * transport is query-shaped (the text bridges — their child processes
    * run any SQL) route through [[query]] and ignore the empty result;
    * plain JDBC overrides this with `executeUpdate`, because
    * `executeQuery` refuses statements that return no result set. */
  def update(sql: String): Unit = { query(sql); () }

  /** When the engine is plain-JDBC-reachable, its (url, properties) — lets
    * the differ fetch leaf rows as a PARTITIONED `spark.read.jdbc` scan
    * (one partition per leaf predicate, executors pulling ranges in
    * parallel) instead of draining statements through this single-threaded
    * text bridge. None = text protocol only. */
  def jdbcSource: Option[(String, java.util.Properties)] = None

  override def close(): Unit = ()
}

/** "Remote" engine backed by the local SparkSession's SQL catalog — the
  * shape used when the other side of a diff is a Spark/Databricks warehouse,
  * and the in-process target for pushdown end-to-end tests (queries run
  * through a real SQL round-trip: text in, text out, no shared plans). */
final class SparkViewEngine(spark: SparkSession,
    val profile: SourceProfile = SparkProfile) extends RemoteEngine {
  def query(sql: String): Seq[Seq[Option[String]]] =
    spark.sql(sql).collect().toSeq.map { r =>
      (0 until r.length).map(i => Option(r.get(i)).map(_.toString))
    }
}

/** The reference's `--interactive` mode: EXPLAIN every query on the remote
  * engine and ask before running it (reference: data_diff/databases/
  * base.py:984-994 — EXPLAIN, print, `input("Continue? [y/n]")`, exit on
  * no). A decorator so any engine gains the gate; `gate` is injectable for
  * tests and embedders, defaulting to the reference's stdin prompt. */
final class InteractiveEngine(inner: RemoteEngine,
    gate: (String, Seq[String]) => Boolean = InteractiveEngine.stdinGate)
  extends RemoteEngine {
  def profile: SourceProfile = inner.profile
  def query(sql: String): Seq[Seq[Option[String]]] = {
    val plan = inner.query(s"EXPLAIN $sql").map(_.flatten.mkString(" "))
    if (!gate(sql, plan))
      throw new IllegalStateException("interactive gate declined query")
    inner.query(sql)
  }
  override def close(): Unit = inner.close()
}

object InteractiveEngine {
  def stdinGate(sql: String, plan: Seq[String]): Boolean = {
    plan.foreach(l => Console.err.println(s"EXPLAIN: $l"))
    Console.err.println(sql)
    val answer = scala.io.StdIn.readLine("Continue? [y/n] ")
    answer != null && Seq("y", "yes").contains(answer.toLowerCase)
  }
}

/** Spark's JDBC datasource has no built-in dialect for HiveServer2-protocol
  * urls, so it falls back to double-quoted identifiers — which Spark SQL /
  * HiveQL parse as STRING LITERALS, silently replacing every fetched column
  * with its own name (observed live: a partitioned `spark.read.jdbc` leaf
  * fetch returned the constant row `('k','s','d')`). Backtick quoting is
  * the dialect fix; registered once, idempotently, by any [[JdbcEngine]]
  * pointed at a hive2 url. */
object HiveJdbcDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
  override def canHandle(url: String): Boolean = url.startsWith("jdbc:hive2")
  override def quoteIdentifier(colName: String): String = s"`$colName`"
  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)
  def register(): Unit =
    if (registered.compareAndSet(false, true))
      org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(this)
}

/** Production bridge for any JDBC-reachable engine — the path a real
  * deployment uses where the test suite uses ProcessEngine (this sandbox
  * ships no JDBC drivers). Values come back text-rendered by the driver,
  * which is exact because every pushed query selects text-rendered
  * (normalized) values by construction. */
final class JdbcEngine(url: String, props: java.util.Properties,
    val profile: SourceProfile) extends RemoteEngine {
  if (url.startsWith("jdbc:hive2")) HiveJdbcDialect.register()
  private lazy val conn = {
    val c = java.sql.DriverManager.getConnection(url, props)
    // Profiles that need per-database helper objects (Derby's Java-backed
    // CREATE FUNCTIONs) install them on connect, so `remote:jdbc:derby:...`
    // works against a database nobody bootstrapped out-of-band. Idempotent:
    // SQLState X0Y68 ("object already exists") is expected on every
    // connection after the first and swallowed; any other failure (e.g. a
    // network server missing the library jar) propagates loudly before the
    // first checksum query could fail confusingly.
    profile.connectBootstrapSql.foreach { ddl =>
      val st = c.createStatement()
      try st.executeUpdate(ddl)
      catch {
        case e: java.sql.SQLException if e.getSQLState == "X0Y68" => ()
      } finally st.close()
    }
    c
  }

  override def jdbcSource: Option[(String, java.util.Properties)] = Some((url, props))

  def query(sql: String): Seq[Seq[Option[String]]] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      try {
        val n = rs.getMetaData.getColumnCount
        val rows = Seq.newBuilder[Seq[Option[String]]]
        while (rs.next())
          rows += (1 to n).map(i => Option(rs.getString(i)))
        rows.result()
      } finally rs.close()
    } finally st.close()
  }

  override def update(sql: String): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(sql) finally st.close()
  }

  override def close(): Unit = conn.close()
}

/** Live DuckDB over the process bridge (the sandbox's demonstration
  * engine — a real deployment would use JdbcEngine with the DuckDB JDBC
  * driver). The child process is DuckDB's Python API fed from stdin via
  * the ProcessEngine line protocol. */
object DuckDbProcess {
  /** argv[1] = database path (":memory:" for ephemeral). */
  val BridgeScript: String =
    """import sys, base64, duckdb
      |con = duckdb.connect(sys.argv[1] if len(sys.argv) > 1 else ':memory:')
      |for line in sys.stdin:
      |    line = line.strip()
      |    if not line:
      |        continue
      |    sql = base64.b64decode(line).decode('utf-8')
      |    try:
      |        rows = con.execute(sql).fetchall()
      |        for r in rows:
      |            print('\t'.join('\\N' if v is None else base64.b64encode(str(v).encode('utf-8')).decode('ascii') for v in r))
      |        print('__END__', flush=True)
      |    except Exception as e:
      |        print('__ERR__ ' + base64.b64encode(str(e).encode('utf-8')).decode('ascii'), flush=True)
      |""".stripMargin

  def engine(dbPath: String = ":memory:"): ProcessEngine =
    new ProcessEngine(Seq("python3", "-c", BridgeScript, dbPath), DuckDbProfile)
}

/** Engine bridged over a child process speaking a line protocol:
  * one base64(SQL) line in; per result row one line of tab-separated
  * base64(value) fields (`\N` = NULL) out, terminated by `__END__`, or
  * `__ERR__ base64(message)` on failure. Base64 framing keeps arbitrary
  * value bytes (tabs, newlines, quotes) unambiguous with zero parsing
  * dependencies on either side.
  *
  * This is how the test suite drives a live DuckDB (via its Python API fed
  * from stdin); any CLI-reachable engine can be wired the same way without
  * new library code — the JDBC path would implement RemoteEngine directly.
  */
final class ProcessEngine(command: Seq[String],
    val profile: SourceProfile) extends RemoteEngine {
  // stderr INHERITS the JVM's stderr: never read by this class, so leaving
  // it piped would deadlock query() once a chatty child fills the ~64 KB
  // pipe buffer (child blocks on stderr, JVM blocks on stdout)
  private val proc = new ProcessBuilder(command: _*)
    .redirectError(ProcessBuilder.Redirect.INHERIT)
    .start()
  private val toProc = new BufferedWriter(new OutputStreamWriter(proc.getOutputStream, UTF_8))
  private val fromProc = new BufferedReader(new InputStreamReader(proc.getInputStream, UTF_8))

  def query(sql: String): Seq[Seq[Option[String]]] = synchronized {
    toProc.write(java.util.Base64.getEncoder.encodeToString(sql.getBytes(UTF_8)))
    toProc.newLine()
    toProc.flush()
    val dec = java.util.Base64.getDecoder
    val rows = Seq.newBuilder[Seq[Option[String]]]
    var line = fromProc.readLine()
    while (line != null && line != "__END__") {
      if (line.startsWith("__ERR__ ")) {
        val msg = new String(dec.decode(line.stripPrefix("__ERR__ ")), UTF_8)
        throw new RuntimeException(s"remote engine error: $msg\nSQL: $sql")
      }
      rows += line.split("\t", -1).toSeq
        .map(f => if (f == "\\N") None else Some(new String(dec.decode(f), UTF_8)))
      line = fromProc.readLine()
    }
    if (line == null)
      throw new RuntimeException(s"remote engine process exited unexpectedly\nSQL: $sql")
    rows.result()
  }

  override def close(): Unit = {
    try toProc.close() catch { case _: Exception => }
    proc.destroy()
  }
}
