package graft.functions

import org.apache.spark.sql.functions._

/** Measures the native `char_entropy` kernel against the dataflow it
  * replaces — per-char explode → (doc, char) hash agg → per-doc entropy
  * agg — on documents at `SPARK_GRAFT_SF_DIR` (median of 3 warm runs
  * each). The explode form is what a built-ins-only pipeline would write;
  * it shuffles one row per character, so its cost scales with corpus
  * BYTES through the exchange while the kernel stays inside the scan.
  * Run: `sbt "runMain graft.functions.EntropyBench"`. */
object EntropyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
      .repartition(cpus.toInt * 2, $"doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count() // materialize

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Unit): Double = {
      f // warm
      Seq(time(f), time(f), time(f)).sorted.apply(1)
    }

    // built-ins-only form: explode characters, histogram, entropy agg.
    // Spark's split(text, '') keeps a trailing '' element — filter it so
    // the baseline computes the SAME entropy the kernel does (a spurious
    // '' symbol per doc would make the comparison non-result-equivalent)
    val explodeForm = median3 {
      docs
        .select($"doc_id", explode(split($"text", "")).as("c"))
        .filter($"c" =!= "")
        .groupBy($"doc_id", $"c").agg(count(lit(1)).cast("double").as("cnt"))
        .groupBy($"doc_id")
        .agg((log2(sum($"cnt")) - sum($"cnt" * log2($"cnt")) / sum($"cnt"))
          .as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    val kernel = median3 {
      docs.select($"doc_id", CharEntropy.charEntropy($"text").as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"""{"explode_sec":$explodeForm%.3f,"kernel_sec":$kernel%.3f,"speedup":${explodeForm / kernel}%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
