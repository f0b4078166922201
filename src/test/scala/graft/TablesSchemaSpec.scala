package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The schema-drift tripwire: every driver-generated table, loaded through
  * the ONE production loader (`Tables.t`), must arrive with exactly the
  * normalized schema the 142 queries and their DuckDB oracles are written
  * against.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed the `ts` physical encoding twice (TIMESTAMP(NANOS)→nanos-as-long
  * in round ~3; plain timestamp[us]/NTZ in round 7 — which failed 16 queries
  * and 8 specs at ANALYSIS time with nothing pointing at the loader). This
  * spec makes the next regeneration fail ONE named test with a schema diff
  * instead of sixteen anonymous DATATYPE_MISMATCH queries.
  */
class TablesSchemaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("tables-schema-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
  )

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$table loads with the normalized engine schema") {
      val got = Tables.t(spark, TestTables.sfDir, table).schema
        .map(f => f.name -> f.dataType)
      assert(got == cols,
        s"\n$table drifted — the driver regenerated /root/testdata with a new " +
          s"physical encoding and Tables.load no longer normalizes it.\n" +
          s"  expected: $cols\n  got:      $got\n" +
          "Fix the seam in Tables.load (QueryDef.scala), NOT the call sites.")
    }
  }

  test("no TimestampNTZ or raw-long timestamp survives the loader at any sf") {
    // sf0.01 is the correctness-gate scale; check it too in case the driver
    // regenerates the sfs differently.
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         table <- expected.keys) {
      val bad = Tables.t(spark, sf, table).schema.filter(f =>
        f.dataType == TimestampNTZType ||
          (f.name == "ts" && f.dataType == LongType))
      assert(bad.isEmpty, s"$sf/$table leaks un-normalized columns: $bad")
    }
  }
}
