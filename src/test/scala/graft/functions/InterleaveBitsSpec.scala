package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `interleave_bits` (Z-order key) — kernel laws, codegen parity, SQL
  * registration, and the layout claim itself: Z-order clustering keeps
  * per-partition min/max tight on BOTH dimensions, so stats-based
  * pruning (parquet footers, partition metadata) skips most of the data
  * for a predicate on the NON-leading dimension, where a linear sort
  * skips nothing.
  */
class InterleaveBitsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("interleave-bits-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def zcol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    ColumnBridge.column(InterleaveBits(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Bit-by-bit reference: bit i of x → bit 2i, bit i of y → bit 2i+1. */
  private def zRef(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("kernel matches the bit-by-bit reference, incl. edge values") {
    val cases = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0xffffffffL, 0L), (0L, 0xffffffffL), (0xffffffffL, 0xffffffffL),
      (0xdeadbeefL, 0x12345678L), (-1L, 7L), (1L << 31, 1L << 31))
    for ((x, y) <- cases)
      assert(InterleaveBits.compute(x, y) === zRef(x, y), s"($x, $y)")
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val x = rnd.nextLong(); val y = rnd.nextLong()
      assert(InterleaveBits.compute(x, y) === zRef(x, y), s"($x, $y)")
    }
  }

  test("interleave is monotone per dimension on prefix-aligned values") {
    // Within a fixed y, increasing x increases z (x occupies even lanes).
    val ys = Seq(0L, 5L, 1023L)
    for (y <- ys; x <- 0L until 64L)
      assert(InterleaveBits.compute(x + 1, y) > InterleaveBits.compute(x, y))
  }

  test("codegen and interpreted eval agree; SQL registration works") {
    import spark.implicits._
    val df = Seq((3L, 5L), (0L, 0L), (0xffffffffL, 1L)).toDF("x", "y")
    val expect = df.collect().map(r => zRef(r.getLong(0), r.getLong(1))).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      for (flag <- Seq("false", "true")) {
        spark.conf.set("spark.sql.codegen.wholeStage", flag)
        assert(df.select(zcol(col("x"), col("y"))).collect()
          .map(_.getLong(0)).toSeq === expect)
      }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    assert(df.selectExpr("interleave_bits(x, y)").collect()
      .map(_.getLong(0)).toSeq === expect)
  }

  test("z-order layout prunes partitions on the non-leading dimension") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val P = 16

    // Per-partition [min, max] of l_partkey under each layout.
    def extents(df: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("l_partkey").as("lo"), max("l_partkey").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))

    val linear = extents(
      li.repartitionByRange(P, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"))
    // Z-order needs SCALE-NORMALIZED dimensions: raw l_orderkey spans more
    // bits than l_partkey, so its high bits would dominate the curve and
    // range-splitting the key would degenerate back to an orderkey sort.
    // Quantile-bucket each dimension to equal width first (ntile here; an
    // approxQuantile cut at scale), then interleave — partitions become a
    // grid cell in BOTH dimensions.
    import org.apache.spark.sql.expressions.Window
    val zed = extents(
      li.withColumn("bx", ntile(256).over(Window.orderBy("l_orderkey")).cast("long") - 1L)
        .withColumn("by", ntile(256).over(Window.orderBy("l_partkey")).cast("long") - 1L)
        .withColumn("z", zcol(col("bx"), col("by")))
        .repartitionByRange(P, col("z"))
        .sortWithinPartitions("z"))

    // Probe point predicates on l_partkey: a partition must be read iff
    // its [min, max] contains the probe (what footer-stats skipping does).
    val probes = li.select("l_partkey").distinct()
      .orderBy("l_partkey").collect().map(_.getLong(0))
      .grouped(math.max(1, 40)).map(_.head).toSeq // every ~40th key
    def hits(ext: Array[(Long, Long)]): Int =
      probes.map(p => ext.count { case (lo, hi) => lo <= p && p <= hi }).sum

    val linearHits = hits(linear)
    val zHits = hits(zed)
    // Linear-by-orderkey leaves l_partkey unclustered: essentially every
    // partition overlaps every probe. Z-order must prune at least 2x.
    assert(linearHits >= (probes.size * linear.length * 9) / 10,
      s"expected the linear layout to be unclustered on l_partkey " +
        s"($linearHits hits of ${probes.size * linear.length})")
    assert(zHits * 2 <= linearHits,
      s"z-order pruned too little: $zHits vs linear $linearHits")
  }
}
