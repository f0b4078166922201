package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE deterministic sampling rule — one definition for every consumer:
  * p02's stratified sampling, and the d12/d16 recall-gate eval samples.
  * A key hashes to a percent bucket via its md5 prefix, so membership is
  * reproducible across runs, engines (the DuckDB oracles spell the same
  * arithmetic), and modules — a drift in one copy would silently
  * de-synchronize "the p02 rule" the eval-sample comments promise. */
private[graft] object Sampling {

  /** md5-derived percent bucket (0..99) of a key column. */
  def pctBucket(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long") % 100L

  /** The same bucket in DuckDB SQL. */
  def pctBucketSql(col: String): String =
    s"CAST('0x' || substr(md5(CAST($col AS VARCHAR)), 1, 4) AS INT) % 100"
}
