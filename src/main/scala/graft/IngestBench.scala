package graft

import graft.streaming.IngestPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion-gate throughput — the streaming LLM-data twin of
  * [[CdcBench]]: documents/second through the composed arrival gate
  * (quality → exact tile dedup → MinHash near-dup → semantic near-dup)
  * against the persisted sf0.1 corpus indexes, end-to-end through
  * Structured Streaming foreachBatch micro-batches.
  *
  * Arrival mix (deterministic, derived from the corpus — no RNG): per
  * replica, one third EXACT copies (must die at the tile stage), one
  * third NEAR-DUPS (first 8 words dropped — shingle sets mostly intact,
  * must die at the band-join stage; the embedding rides along unchanged
  * so survivors meet the semantic stage too), one third FRESH (every
  * word replica-prefixed — disjoint shingles, must reach `accepted`).
  * The mix matters: an all-fresh stream never pays the verify joins, an
  * all-dup stream never pays the full pipeline — this one pays both.
  *
  * Usage: IngestBench [nArrivals] [nBatches]. Prints one JSON line and
  * writes BENCH_ingest.json with per-verdict counts (the counts are also
  * the correctness smoke: zero exact_dup or zero accepted means the mix
  * broke, and the number is meaningless).
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nArrivals = args.headOption.map(_.toInt).getOrElse(20000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = Tables.t(spark, sfDir, "documents").select($"doc_id", $"text")
    val vectors = Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    // index build is one-time corpus-side setup (a production deployment
    // mounts these as tables) — built and materialized OUTSIDE timing
    val sides = IngestPipeline.corpusIndex(corpus, vectors).persist()
    (Seq(sides.tiles, sides.bands, sides.shingles, sides.counts) ++ sides.sem)
      .foreach(_.write.format("noop").mode("overwrite").save())

    // deterministic arrival mix, written as nBatches time-ordered files
    val nCorpus = corpus.count()
    val reps = math.max(1L, nArrivals / (nCorpus * 3))
    val repDf = spark.range(reps).toDF("rep")
    val base = corpus.join(vectors, $"doc_id" === $"vec_id", "left")
      .select($"doc_id", $"text", $"embedding").crossJoin(repDf)
    def arrId(kind: Int) = ($"doc_id" + $"rep" * 10000000L + lit(kind) * 100000000L).as("doc_id")
    val exactArr = base.select(arrId(1), $"text", $"embedding")
    val nearArr = base.select(arrId(2),
      // drop the first 8 words: most shingles survive -> near-dup flag
      expr("substring(text, length(regexp_extract(text, '^(\\\\S+ ){8}', 0)) + 1)").as("text"),
      $"embedding")
    val freshArr = base.select(arrId(3),
      regexp_replace($"text", lit("(\\S+)"), concat(lit("f"), $"rep", lit("$1"))).as("text"),
      // rotate the embedding by one: norm-preserving, genuinely different
      expr("concat(slice(embedding, 2, size(embedding) - 1), slice(embedding, 1, 1))").as("embedding"))
    val arrivals = exactArr.unionAll(nearArr).unionAll(freshArr)
      .withColumn("b", pmod($"doc_id", lit(nBatches.toLong)))
    val dir = java.nio.file.Files.createTempDirectory("ingestbench")
    (0 until nBatches).foreach { b =>
      // ONE part-file per batch dir: the file source triggers per FILE,
      // so a multi-part write would silently shred each intended batch
      // into per-part micro-batches and the run would measure fixed
      // per-trigger overhead instead of gate throughput
      arrivals.filter($"b" === b.toLong).drop("b").coalesce(1)
        .write.parquet(s"$dir/f$b")
    }
    val schema = spark.read.parquet(s"$dir/f0").schema
    val total = spark.read.parquet(s"$dir/f*").count()

    // JIT/codegen warmup on one small batch, outside timing
    IngestPipeline.gateBatch(
      spark.read.parquet(s"$dir/f0").limit(200), sides)
      .groupBy($"verdict").count().collect()

    val counts = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val t0 = System.nanoTime()
    val q = IngestPipeline.start(stream, sides,
      checkpoint = s"$dir/ckp")({ (verdicts: DataFrame, id: Long) =>
      val b0 = System.nanoTime()
      verdicts.groupBy("verdict").count().collect()
        .foreach(r => counts(r.getString(0)) += r.getLong(1))
      System.err.println(f"[ingest] batch $id sink ${(System.nanoTime() - b0) / 1e9}%.2f s")
    })
    q.processAllAvailable()
    q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    val rate = (total / secs).toLong

    val vjson = counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    // machine-derived trend clause (r15 "What's wrong" 4), computed against
    // the previous round's committed artifact before this run overwrites it
    val vsPrev = BenchPrev.note("BENCH_ingest.json",
      Seq("ingest_docs_per_sec" -> rate.toDouble))
    val out =
      s"""{"metric":"ingest_throughput","docs":$total,"batches":$nBatches,"secs":${f"$secs%.2f"},"ingest_docs_per_sec":$rate,"vs_prev":"$vsPrev","verdicts":$vjson,"corpus_docs":$nCorpus,"sf":"$sfDir","method":"composed quality->tile->minhash->semantic gate via Structured Streaming foreachBatch, $nBatches file micro-batches, corpus indexes persisted outside timing; arrival mix 1/3 exact copies + 1/3 near-dups (8 words dropped) + 1/3 fresh (replica-prefixed words, rotated embeddings)"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_ingest.json"),
      (out + "\n").getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
