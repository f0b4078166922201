package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared operator inventory: each entry is one operator family from
  * SURVEY.md §2 (or a north-star LLM-pipeline operator), implemented
  * Spark-first, with a DuckDB oracle for the hash-compare gate.
  */
object SparkEntry {

  // a def, not a lazy val: Multimodal's oracle SQL embeds the dir-keyed
  // decode-dump paths of the last dir queried, so the strings must be
  // built when `oracleSql` is collected (after the queries ran), not at
  // first access
  private def all: Seq[QueryDef] =
    analytics.Tpch.defs ++
      analytics.Events.defs ++
      analytics.CdcQueries.defs ++
      analytics.TextOps.defs ++
      analytics.Dedup.defs ++
      analytics.Similarity.defs ++
      analytics.Multimodal.defs ++
      analytics.Curation.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(all.map(q => q.name -> q.run): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }: _*)
}
