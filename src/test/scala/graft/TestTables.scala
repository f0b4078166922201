package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE fixture loader for driver-generated testdata in specs.
  *
  * Specs must load tables through `graft.Tables.t` (via these helpers), never
  * `spark.read.parquet` + a hand-rolled timestamp rewrite: the driver
  * regenerates the parquet between rounds and has already changed the `ts`
  * physical encoding twice (TIMESTAMP(NANOS) → timestamp[us]/NTZ). The loader
  * normalizes whatever encoding arrives to TimestampType in one place;
  * a spec with its own copy silently breaks on the next regeneration
  * (round 7: three specs × hardcoded `ts div 1000` = 8 red tests).
  */
object TestTables {
  val sfDir = "/root/testdata/sf0.001"

  def events(spark: SparkSession): DataFrame = Tables.t(spark, sfDir, "events")
  def table(spark: SparkSession, name: String): DataFrame = Tables.t(spark, sfDir, name)
}
