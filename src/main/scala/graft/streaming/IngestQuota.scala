package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Ingestion-time per-source quota admission — the ARRIVAL-TIME twin of
  * batch p12 (domain capping).
  *
  * A batch pipeline caps a source by ranking everything it has; an ingest
  * pipeline must decide AT ARRIVAL, without the future: admit a source's
  * documents until its quota is filled, reject the rest forever. That is
  * per-key counter state — `flatMapGroupsWithState` keyed by source, the
  * state a single long (documents admitted so far), no timeout: a quota
  * never expires.
  *
  * Determinism: arrival order across executors is not a total order, so
  * "first QUOTA to arrive" is only well-defined per micro-batch — within
  * a batch, a source's arrivals are admitted in ascending `doc_id` order
  * (the stable tie-break every operator here uses). Across batches the
  * micro-batch sequence IS the arrival order, which makes the operator
  * exactly replayable: the same batches in the same order admit the same
  * set (IngestQuotaSpec locks stream == batch-replay parity and
  * restart-resume via the state store).
  *
  * Scale: state is ONE counter per source (not per document) — bounded by
  * the number of sources, the smallest state any gate here carries; the
  * shuffle is the same per-source hash exchange p12's TopKPerKey uses.
  * The per-batch sort is per-source within one batch, never corpus-wide.
  */
object IngestQuota {

  /** One admission verdict per arrival: (doc_id, source, admitted,
    * admitted_before) — `admitted_before` is the source's filled count
    * when this doc was decided, so downstream can reconstruct the exact
    * admission sequence. */
  def admit(stream: DataFrame, quota: Long): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("doc_id").cast("long"), col("source").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          var filled = state.getOption.getOrElse(0L)
          val out = rows.map(_._1).toArray.sorted.iterator.map { id =>
            val before = filled
            val ok = filled < quota
            if (ok) filled += 1
            (id, source, ok, before)
          }.toVector
          state.update(filled)
          out.iterator
      }
      .toDF("doc_id", "source", "admitted", "admitted_before")
  }

  /** The batch twin on one static frame — what [[admit]] must equal when
    * the whole stream arrives as a single batch (the spec's parity
    * anchor): rank by doc_id per source, admit rank ≤ quota. */
  def admitBatch(docs: DataFrame, quota: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs.select(col("doc_id").cast("long"), col("source").cast("string"))
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("source"),
        (col("rn") <= quota).as("admitted"),
        least(col("rn") - 1L, lit(quota)).cast("long").as("admitted_before"))
  }

  /** Run the gate over a stream of (doc_id, source). */
  def start(stream: DataFrame, quota: Long, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    admit(stream, quota).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(batch.toDF(), id)
      }
      .start()
}
