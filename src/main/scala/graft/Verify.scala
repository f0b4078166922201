package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional 3rd arg: comma-separated subset of query names (iteration aid)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[2,16,4096] runs the whole suite
    // with REAL executor processes (separate JVMs, real serialization,
    // real block-manager transfers) — the closest offline approximation
    // of a multi-executor cluster. Needs the classes as a jar
    // (SPARK_GRAFT_JARS=target/scala-2.13/<...>.jar from `sbt package`)
    // since executors run from SPARK_HOME, not the sbt classpath.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    // SPARK_GRAFT_CHECKPOINT_DIR flips every iterated plan's
    // materialization from localCheckpoint to RELIABLE checkpoint
    // (GraftSession.materialize) — combined with local-cluster this is
    // the preemption-survivability configuration run end-to-end.
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
      .foreach(d => builder.config(GraftSession.CheckpointDirKey, d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    BenchLog.quietBoundedWindowWarnings()
    new java.io.File(outDir).mkdirs()
    // A query that throws leaves no parquet dir, and a missing dir is
    // indistinguishable from a never-declared query in the driver's
    // correctness JSON (round 7: 16 analysis failures read as 126/126
    // all-green). failed.json makes the dump self-describing: one
    // name→message entry per declared query that threw.
    val failures = collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/failed.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} FAILED: ${failures.keys.mkString(",")}")
    spark.stop()
  }
}
