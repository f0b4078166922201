package graft.cdc

/** The mysqldump CHILD-PROCESS bootstrap mode — the reference's original
  * schema-acquisition path (`/root/reference/dump/dump.go:145-243`:
  * argument-vector construction :146-214, the CREATE DATABASE/USE preamble
  * for table-scoped dumps :210-214, streamed stdout→parser pipe in
  * `DumpAndParse` :228-243), as an alternative front door to the
  * protocol-native `mysql.ClientBootstrap`. Production deployments that
  * already trust mysqldump (or can't grant the snapshot privileges the
  * protocol path needs) shell out; everything downstream is the SAME
  * `DumpParser.bootstrap` contract, so the two modes are interchangeable.
  *
  * Process semantics mirrored from the reference:
  *  - stdout is STREAMED into the parser while the child runs (the
  *    reference's io.Pipe) — a multi-TB dump never buffers in memory;
  *  - stderr drains concurrently into a bounded tail so a failing child
  *    can't deadlock on a full pipe, and the tail rides the error;
  *  - a non-zero exit fails the bootstrap even if the parse succeeded
  *    (a truncated dump can parse cleanly — the exit code is the truth);
  *  - table-scoped dumps prepend `CREATE DATABASE IF NOT EXISTS` + `USE`
  *    because mysqldump omits the database name in that mode (dump.go's
  *    "makes us hard to parse" note).
  */
object MysqldumpDumper {

  final case class Config(
      executionPath: String = "mysqldump",
      addr: String = "127.0.0.1:3306",
      user: String = "root",
      password: String = "",
      databases: Seq[String] = Nil,
      tableDb: String = "",
      tables: Seq[String] = Nil,
      ignoreTables: Seq[(String, String)] = Nil,
      charset: String = "utf8",
      where: String = "",
      skipMasterData: Boolean = false,
      maxAllowedPacketMb: Int = 0,
      hexBlob: Boolean = false)

  /** The mysqldump argument vector — dump.go:146-214 order and spelling
    * (pure function; the spec pins it as a golden vector). */
  def args(c: Config): Vector[String] = {
    val b = Vector.newBuilder[String]
    val seps = c.addr.split(":", 2)
    b += s"--host=${seps(0)}"
    if (seps.length > 1) b += s"--port=${seps(1)}"
    b += s"--user=${c.user}"
    b += s"--password=${c.password}"
    if (!c.skipMasterData) b += "--master-data"
    b += "--no-data"
    if (c.maxAllowedPacketMb > 0) b += s"--max-allowed-packet=${c.maxAllowedPacketMb}M"
    b += "--single-transaction"
    b += "--skip-lock-tables"
    b += "--compact"
    b += "--skip-opt"
    b += "--quick"
    b += "--skip-extended-insert"
    if (c.hexBlob) b += "--hex-blob"
    c.ignoreTables.foreach { case (db, t) => b += s"--ignore-table=$db.$t" }
    if (c.charset.nonEmpty) b += s"--default-character-set=${c.charset}"
    if (c.where.nonEmpty) b += s"--where=${c.where}"
    if (c.tables.isEmpty && c.databases.isEmpty) b += "--all-databases"
    else if (c.tables.isEmpty) { b += "--databases"; c.databases.foreach(b += _) }
    else { b += c.tableDb; c.tables.foreach(b += _) }
    b.result()
  }

  /** Lines injected ahead of the child's stdout in table-scoped mode
    * (dump.go:210-214). */
  def preamble(c: Config): Seq[String] =
    if (c.tables.nonEmpty)
      Seq(s"CREATE DATABASE IF NOT EXISTS `${c.tableDb}`;", s"USE `${c.tableDb}`;")
    else Nil

  final class MysqldumpException(msg: String) extends RuntimeException(msg)

  /** Spawn mysqldump, stream its stdout through `DumpParser.bootstrap`
    * into `tracker`, and return the resume Progress. */
  def dumpAndBootstrap(c: Config, tracker: SchemaTracker, serverId: Long = 0L): Progress = {
    val pb = new ProcessBuilder((c.executionPath +: args(c)): _*)
    val proc =
      try pb.start()
      catch {
        case e: java.io.IOException =>
          throw new MysqldumpException(s"cannot exec ${c.executionPath}: ${e.getMessage}")
      }
    // bounded stderr tail on its own thread — never blocks the child
    val errTail = new java.util.concurrent.ConcurrentLinkedDeque[String]()
    val errThread = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getErrorStream, "UTF-8"))
      var line = r.readLine()
      while (line != null) {
        errTail.addLast(line)
        while (errTail.size() > 20) errTail.removeFirst()
        line = r.readLine()
      }
    }, "mysqldump-stderr")
    errThread.setDaemon(true)
    errThread.start()
    try {
      val stdout = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      val lines = preamble(c).iterator ++
        Iterator.continually(stdout.readLine()).takeWhile(_ != null)
      val progress = DumpParser.bootstrap(lines, tracker, serverId)
      val rc = proc.waitFor()
      errThread.join(2000)
      if (rc != 0) {
        val tail = {
          val it = errTail.iterator(); val sb = new StringBuilder
          while (it.hasNext) { sb.append(it.next()); if (it.hasNext) sb.append('\n') }
          sb.toString
        }
        throw new MysqldumpException(
          s"${c.executionPath} exited $rc${if (tail.nonEmpty) s"; stderr tail:\n$tail" else ""}")
      }
      progress
    } finally proc.destroy()
  }
}
