package graft.analytics

import graft.{QueryDef, Tables}
import graft.sqlx._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator inventory over the TPC-H-ish star schema.
  *
  * The reference (bytewatch/dolphinbeat) has no relational operators of its
  * own — SURVEY.md §2.9 documents their absence — so this layer is the
  * Spark-built-in analytics surface the port adds on top of the change
  * stream: scans with pushdown, filters, broadcast/sort-merge/semi/anti
  * joins, hash aggregation (partial+final), distinct, rollup/cube, window
  * functions, sorts/limits/top-k, set operations, and scalar functions.
  * Everything is declarative DataFrame API: Catalyst handles predicate
  * pushdown, column pruning, and join selection (AQE at runtime).
  *
  * Scale notes (100 TB): all joins against region/nation/customer/supplier/
  * part are explicitly broadcast (dimension tables); lineitem/orders-sized
  * inputs only ever shuffle on their aggregation/join keys, with map-side
  * partial aggregation from the decimal-sum accumulators.
  */
object Tpch {
  import Tables.t

  private def li(s: SparkSession, dir: String) = t(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = t(s, dir, "orders")
  private def cust(s: SparkSession, dir: String) = t(s, dir, "customer")
  private def supp(s: SparkSession, dir: String) = t(s, dir, "supplier")
  private def part(s: SparkSession, dir: String) = t(s, dir, "part")
  private def nat(s: SparkSession, dir: String) = t(s, dir, "nation")
  private def reg(s: SparkSession, dir: String) = t(s, dir, "region")

  val defs: Seq[QueryDef] = Seq(
    // ---- q01: pricing summary (hash agg, partial+final, exact sums) ----
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        li(s, dir)
          .filter($"l_shipdate" <= ts("1998-09-02 00:00:00"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
            davg($"l_quantity").as("avg_qty"),
            davg($"l_extendedprice").as("avg_price"),
            davg($"l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
          ${SUM("l_quantity")} AS sum_qty,
          ${SUM("l_extendedprice")} AS sum_base_price,
          ${SUM("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
          ${SUM("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge,
          ${AVG("l_quantity")} AS avg_qty,
          ${AVG("l_extendedprice")} AS avg_price,
          ${AVG("l_discount")} AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
    ),

    // ---- q02: best supplier per nation (window rank over broadcast join) --
    QueryDef(
      "q02_top_supplier_per_nation",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"n_nationkey").orderBy($"s_acctbal".desc, $"s_suppkey")
        supp(s, dir)
          .join(broadcast(nat(s, dir)), $"s_nationkey" === $"n_nationkey")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"n_name", $"s_name", $"s_acctbal")
          .orderBy($"n_name")
      },
      Some("""
        SELECT n_name, s_name, s_acctbal FROM (
          SELECT n_name, s_name, s_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY n_nationkey
                                    ORDER BY s_acctbal DESC, s_suppkey) AS rn
          FROM supplier JOIN nation ON s_nationkey = n_nationkey) x
        WHERE rn = 1 ORDER BY n_name"""),
    ),

    // ---- q03: shipping priority (3-way join + agg + top-k) ----
    QueryDef(
      "q03_shipping_priority",
      (s, dir) => {
        import s.implicits._
        cust(s, dir).filter($"c_mktsegment" === "BUILDING")
          .join(ord(s, dir), $"c_custkey" === $"o_custkey")
          .filter($"o_orderdate" < ts("1998-03-15 00:00:00"))
          .join(li(s, dir), $"o_orderkey" === $"l_orderkey")
          .filter($"l_shipdate" > ts("1998-03-15 00:00:00"))
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .select($"l_orderkey", $"revenue", date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"), $"o_orderpriority")
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      Some(s"""
        SELECT l_orderkey, ${SUM("l_extendedprice*(1.0-l_discount)")} AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
    ),

    // ---- q04: order priority count (EXISTS / left-semi join) ----
    QueryDef(
      "q04_order_priority",
      (s, dir) => {
        import s.implicits._
        ord(s, dir)
          .filter($"o_orderdate" >= ts("1997-07-01 00:00:00") && $"o_orderdate" < ts("1997-10-01 00:00:00"))
          .join(li(s, dir).filter($"l_quantity" > 45).select($"l_orderkey"),
            $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority").agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    ),

    // ---- q05: regional revenue (5-way join, broadcast dims) ----
    QueryDef(
      "q05_regional_revenue",
      (s, dir) => {
        import s.implicits._
        li(s, dir)
          .join(ord(s, dir), $"l_orderkey" === $"o_orderkey")
          .filter($"o_orderdate" >= ts("1997-01-01 00:00:00") && $"o_orderdate" < ts("1998-01-01 00:00:00"))
          .join(broadcast(cust(s, dir)), $"o_custkey" === $"c_custkey")
          .join(broadcast(supp(s, dir)),
            $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(nat(s, dir)), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(reg(s, dir)), $"n_regionkey" === $"r_regionkey")
          .filter($"r_name" === "ASIA")
          .groupBy($"n_name")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some(s"""
        SELECT n_name, ${SUM("l_extendedprice*(1.0-l_discount)")} AS revenue
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name ORDER BY revenue DESC, n_name"""),
    ),

    // ---- q06: revenue forecast (scan + filter pushdown + scalar agg) ----
    QueryDef(
      "q06_revenue_forecast",
      (s, dir) => {
        import s.implicits._
        li(s, dir)
          .filter($"l_shipdate" >= ts("1997-01-01 00:00:00") && $"l_shipdate" < ts("1998-01-01 00:00:00"))
          .filter($"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
          .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some(s"""
        SELECT ${SUM("l_extendedprice*l_discount")} AS revenue, COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""),
    ),

    // ---- q07: volume shipping between two nations (TPC-H Q7) ----
    // Bidirectional trade flow: revenue by (supplier nation, customer
    // nation, ship year) for one nation pair. Both nation filters push
    // BELOW the fact joins: the supplier side collapses to a 2/25
    // broadcast before lineitem is touched, the customer side prunes
    // before the orderkey shuffle — the only big exchange left is the
    // one lineitem⋈orders join, identical at 100 TB.
    QueryDef(
      "q07_volume_shipping",
      (s, dir) => {
        import s.implicits._
        val supps = supp(s, dir)
          .join(broadcast(nat(s, dir)), $"s_nationkey" === $"n_nationkey")
          .filter($"n_name".isin("NATION_18", "NATION_19"))
          .select($"s_suppkey", $"n_name".as("supp_nation"))
        val custs = cust(s, dir)
          .join(broadcast(nat(s, dir)), $"c_nationkey" === $"n_nationkey")
          .filter($"n_name".isin("NATION_18", "NATION_19"))
          .select($"c_custkey", $"n_name".as("cust_nation"))
        li(s, dir)
          .filter($"l_shipdate" < ts("1999-01-01 00:00:00"))
          .join(broadcast(supps), $"l_suppkey" === $"s_suppkey")
          .join(ord(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(custs, $"o_custkey" === $"c_custkey")
          .filter($"supp_nation" =!= $"cust_nation")
          .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"supp_nation", $"cust_nation", $"l_year")
      },
      Some(s"""
        SELECT supp_nation, cust_nation, l_year, ${SUM("volume")} AS revenue FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(YEAR(l_shipdate) AS INT) AS l_year,
                 l_extendedprice*(1.0-l_discount) AS volume
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
              OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
            AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00') shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year"""),
    ),

    // ---- q08: national market share (TPC-H Q8) ----
    // One nation's share of a region's part-type trade volume by order
    // year: a conditional-sum ratio over a 6-way join. Every dimension
    // filter (part type, region membership) reduces to a broadcast BEFORE
    // the fact shuffles; the ratio itself is two exact decimal sums over
    // the same rows, divided once — the q14 pattern, deterministic in
    // both engines.
    QueryDef(
      "q08_market_share",
      (s, dir) => {
        import s.implicits._
        val asiaCustNations = broadcast(nat(s, dir)
          .join(broadcast(reg(s, dir).filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey".as("cn_key")))
        val suppNations = broadcast(nat(s, dir)
          .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation")))
        li(s, dir)
          .join(broadcast(part(s, dir).filter($"p_type" === "ECONOMY").select($"p_partkey")),
            $"l_partkey" === $"p_partkey")
          .join(ord(s, dir)
            .filter($"o_orderdate" >= ts("1995-01-01 00:00:00") &&
              $"o_orderdate" < ts("1997-01-01 00:00:00")),
            $"l_orderkey" === $"o_orderkey")
          .join(cust(s, dir), $"o_custkey" === $"c_custkey")
          .join(asiaCustNations, $"c_nationkey" === $"cn_key")
          .join(broadcast(supp(s, dir)), $"l_suppkey" === $"s_suppkey")
          .join(suppNations, $"s_nationkey" === $"sn_key")
          .withColumn("volume", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .groupBy(year($"o_orderdate").as("o_year"))
          .agg((dsum(when($"supp_nation" === "NATION_3", $"volume").otherwise(0.0))
            / dsum($"volume")).as("mkt_share"))
          .orderBy($"o_year")
      },
      Some(s"""
        SELECT o_year,
               ${SUM("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")}
                 / ${SUM("volume")} AS mkt_share FROM (
          SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
                 l_extendedprice*(1.0-l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM part JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00') all_nations
        GROUP BY o_year ORDER BY o_year"""),
    ),

    // ---- q09: revenue by supplier-nation and order year ----
    QueryDef(
      "q09_nation_year_revenue",
      (s, dir) => {
        import s.implicits._
        li(s, dir)
          .join(ord(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(broadcast(supp(s, dir)), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(nat(s, dir)), $"s_nationkey" === $"n_nationkey")
          .groupBy($"n_name", year($"o_orderdate").as("o_year"))
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"n_name", $"o_year".desc)
      },
      Some(s"""
        SELECT n_name, CAST(YEAR(o_orderdate) AS INT) AS o_year,
               ${SUM("l_extendedprice*(1.0-l_discount)")} AS revenue
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, YEAR(o_orderdate) ORDER BY n_name, o_year DESC"""),
    ),

    // ---- q10: returned items report (join + agg + top-k) ----
    QueryDef(
      "q10_returned_items",
      (s, dir) => {
        import s.implicits._
        li(s, dir).filter($"l_returnflag" === "R")
          .join(ord(s, dir), $"l_orderkey" === $"o_orderkey")
          .filter($"o_orderdate" >= ts("1997-10-01 00:00:00") && $"o_orderdate" < ts("1998-01-01 00:00:00"))
          .join(broadcast(cust(s, dir)), $"o_custkey" === $"c_custkey")
          .join(broadcast(nat(s, dir)), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(20)
      },
      Some(s"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               ${SUM("l_extendedprice*(1.0-l_discount)")} AS revenue
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20"""),
    ),

    // ---- q11: important parts by regional supply value (TPC-H Q11 ----
    // ---- shape: group-agg HAVING > scalar-subquery threshold)      ----
    // The synthetic schema has no partsupp, so "stock value" is the
    // shipped value per part from one region's suppliers; a part is
    // "important" when it carries more than 2x the mean per-part value.
    // The threshold is a SCALAR derived from the same aggregate (classic
    // Q11's `HAVING sum > (SELECT sum(...)*frac)`): Spark computes the
    // per-part aggregate ONCE, reduces it to a one-row total, and
    // broadcast-cross-joins that row back — the fact table is scanned
    // once, the second pass touches only #parts rows. The comparison is
    // rearranged to value*cnt > 2*total so no engine divides a decimal
    // (DuckDB and Spark round decimal division differently); both sides
    // compare identical IEEE754 doubles. The mean-relative threshold also
    // keeps selectivity SF-invariant (a fixed fraction of total flips
    // from all-pass to none-pass as #parts grows).
    QueryDef(
      "q11_important_parts",
      (s, dir) => {
        import s.implicits._
        val asiaSupp = broadcast(supp(s, dir)
          .join(broadcast(nat(s, dir)), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(reg(s, dir).filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
          .select($"s_suppkey"))
        val v = li(s, dir)
          .join(asiaSupp, $"l_suppkey" === $"s_suppkey")
          .groupBy($"l_partkey")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("value"))
        val tot = v.agg(dsum($"value").as("total"), count(lit(1)).as("cnt"))
        v.crossJoin(broadcast(tot))
          .filter($"value" * $"cnt" > lit(2.0) * $"total")
          .select($"l_partkey", $"value")
          .orderBy($"value".desc, $"l_partkey")
      },
      Some(s"""
        WITH v AS (
          SELECT l_partkey, ${SUM("l_extendedprice*(1.0-l_discount)")} AS value
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
          GROUP BY l_partkey),
        t AS (SELECT ${SUM("value")} AS total, COUNT(*) AS cnt FROM v)
        SELECT l_partkey, value FROM v, t
        WHERE value * cnt > 2.0 * total
        ORDER BY value DESC, l_partkey"""),
    ),

    // ---- q12: priority classification (conditional agg / CASE WHEN) ----
    QueryDef(
      "q12_priority_lines",
      (s, dir) => {
        import s.implicits._
        li(s, dir)
          .join(ord(s, dir), $"l_orderkey" === $"o_orderkey")
          .filter($"l_shipdate" >= ts("1997-01-01 00:00:00") && $"l_shipdate" < ts("1998-01-01 00:00:00"))
          .groupBy($"l_linestatus")
          .agg(
            sum(when($"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH", 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when($"o_orderpriority" =!= "1-URGENT" && $"o_orderpriority" =!= "2-HIGH", 1L)
              .otherwise(0L)).as("low_line_count"))
          .orderBy($"l_linestatus")
      },
      Some("""
        SELECT l_linestatus,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus ORDER BY l_linestatus"""),
    ),

    // ---- q13: customer order-count distribution (left outer join) ----
    QueryDef(
      "q13_customer_distribution",
      (s, dir) => {
        import s.implicits._
        val counts = cust(s, dir)
          .join(ord(s, dir).filter(!$"o_orderpriority".startsWith("5")),
            $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
        counts.groupBy($"c_count").agg(count(lit(1)).as("custdist"))
          .orderBy($"custdist".desc, $"c_count".desc)
      },
      Some("""
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '5%'
          GROUP BY c_custkey) x
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""),
    ),

    // ---- q14: promo revenue (ratio of conditional exact sums) ----
    QueryDef(
      "q14_promo_revenue",
      (s, dir) => {
        import s.implicits._
        li(s, dir)
          .filter($"l_shipdate" >= ts("1997-09-01 00:00:00") && $"l_shipdate" < ts("1997-10-01 00:00:00"))
          .join(broadcast(part(s, dir)), $"l_partkey" === $"p_partkey")
          .agg(
            (lit(100.0) * dsum(when($"p_type" === "PROMO",
              $"l_extendedprice" * (lit(1.0) - $"l_discount")).otherwise(0.0))
              / dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("promo_revenue"))
      },
      Some(s"""
        SELECT 100.0 * ${SUM("CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END")}
               / ${SUM("l_extendedprice*(1.0-l_discount)")} AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"""),
    ),

    // ---- q15: top supplier(s) by quarter revenue (exact-decimal rank) ----
    QueryDef(
      "q15_top_supplier",
      (s, dir) => {
        import s.implicits._
        val rev = li(s, dir)
          .filter($"l_shipdate" >= ts("1997-01-01 00:00:00") && $"l_shipdate" < ts("1997-04-01 00:00:00"))
          .groupBy($"l_suppkey")
          .agg(dsumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev_exact"))
        // rank()===1 over an unpartitioned window funnels the whole
        // per-supplier aggregate through one task; when k=1 with ties kept,
        // RANK is just equality with the global max — a one-row broadcast
        // join. Exact DECIMAL revenue makes the equality well-defined.
        val maxRev = rev.agg(max($"rev_exact").as("max_rev"))
        rev.join(broadcast(maxRev), $"rev_exact" === $"max_rev")
          .join(broadcast(supp(s, dir)), $"l_suppkey" === $"s_suppkey")
          .select($"s_suppkey", $"s_name", dec2dbl($"rev_exact").as("total_revenue"))
          .orderBy($"s_suppkey")
      },
      Some("""
        SELECT s_suppkey, s_name, CAST(CAST(rev_exact AS VARCHAR) AS DOUBLE) AS total_revenue FROM (
          SELECT l_suppkey, SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS rev_exact,
                 RANK() OVER (ORDER BY SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) DESC) AS rk
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey) x
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE rk = 1 ORDER BY s_suppkey"""),
    ),

    // ---- q16: supplier diversity per brand/size (distinct agg) ----
    QueryDef(
      "q16_brand_supplier_counts",
      (s, dir) => {
        import s.implicits._
        li(s, dir)
          .join(broadcast(part(s, dir)), $"l_partkey" === $"p_partkey")
          .filter($"p_type" =!= "MEDIUM" && $"p_size".isin(1, 5, 9, 13, 17, 21, 25, 29))
          .groupBy($"p_brand", $"p_size")
          .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
          .orderBy($"supplier_cnt".desc, $"p_brand", $"p_size")
      },
      Some("""
        SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type <> 'MEDIUM' AND p_size IN (1,5,9,13,17,21,25,29)
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size"""),
    ),

    // ---- q17: small-quantity revenue (per-key avg threshold join) ----
    QueryDef(
      "q17_small_quantity_revenue",
      (s, dir) => {
        import s.implicits._
        // Push the brand filter below the per-part average: the avg is only
        // consumed for Brand#23 parts, so semi-restricting lineitem first
        // (broadcast of the tiny filtered part side) shrinks the aggregate
        // input ~25x — the classic Q17 decorrelation. Result is identical:
        // the per-part avg doesn't change by dropping parts never joined.
        val liBrand = li(s, dir)
          .join(broadcast(part(s, dir).filter($"p_brand" === "Brand#23")
            .select($"p_partkey")), $"l_partkey" === $"p_partkey")
        val pa = liBrand.groupBy($"l_partkey".as("pa_partkey"))
          .agg(davg($"l_quantity").as("avg_qty"))
        liBrand
          .join(pa, $"l_partkey" === $"pa_partkey")
          .filter($"l_quantity" < lit(0.5) * $"avg_qty")
          .agg((dsum($"l_extendedprice") / 7.0).as("avg_yearly"))
      },
      Some(s"""
        SELECT ${SUM("l_extendedprice")}/7.0 AS avg_yearly
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN (SELECT l_partkey AS pa_partkey, ${AVG("l_quantity")} AS avg_qty
                FROM lineitem GROUP BY l_partkey) pa
            ON l_partkey = pa_partkey
        WHERE p_brand = 'Brand#23' AND l_quantity < 0.5*avg_qty"""),
    ),

    // ---- q18: large-volume customers (group-having on exact sum) ----
    QueryDef(
      "q18_large_volume_customers",
      (s, dir) => {
        import s.implicits._
        val big = li(s, dir).groupBy($"l_orderkey".as("big_orderkey"))
          .agg(dsumExact($"l_quantity").as("sum_qty_exact"))
          .filter($"sum_qty_exact" > 212)
        ord(s, dir)
          .join(big, $"o_orderkey" === $"big_orderkey")
          .join(broadcast(cust(s, dir)), $"o_custkey" === $"c_custkey")
          .select($"c_name", $"c_custkey", $"o_orderkey",
            date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"), $"o_totalprice",
            dec2dbl($"sum_qty_exact").as("sum_qty"))
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(100)
      },
      Some("""
        SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_totalprice, CAST(CAST(sum_qty_exact AS VARCHAR) AS DOUBLE) AS sum_qty
        FROM orders
          JOIN (SELECT l_orderkey AS big_orderkey,
                       SUM(CAST(l_quantity AS DECIMAL(28,10))) AS sum_qty_exact
                FROM lineitem GROUP BY l_orderkey
                HAVING SUM(CAST(l_quantity AS DECIMAL(28,10))) > 212) big
            ON o_orderkey = big_orderkey
          JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
    ),

    // ---- q19: disjunctive pushdown predicate (OR-of-ANDs) ----
    QueryDef(
      "q19_disjunctive_revenue",
      (s, dir) => {
        import s.implicits._
        li(s, dir)
          .join(broadcast(part(s, dir)), $"l_partkey" === $"p_partkey")
          .filter(
            ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) && $"l_quantity".between(1, 11)) ||
            ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) && $"l_quantity".between(10, 20)) ||
            ($"p_brand" === "Brand#34" && $"p_size".between(1, 15) && $"l_quantity".between(20, 30)))
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some(s"""
        SELECT ${SUM("l_extendedprice*(1.0-l_discount)")} AS revenue, COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""),
    ),

    // ---- q22: rich customers with no orders (scalar subq + anti join) ----
    QueryDef(
      "q22_idle_rich_customers",
      (s, dir) => {
        import s.implicits._
        val c = cust(s, dir)
        val avgBal = c.filter($"c_acctbal" > 0.0)
          .agg(davg($"c_acctbal").as("a")).select($"a")
        c.join(broadcast(avgBal))
          .filter($"c_acctbal" > $"a")
          // anti-join against URGENT orders only: on this synthetic data every
          // customer has some order, so the unrestricted NOT EXISTS matches the
          // empty set (a trivially-green check)
          .join(ord(s, dir).filter($"o_orderpriority" === "1-URGENT").select($"o_custkey"),
            $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("numcust"), dsum($"c_acctbal").as("totacctbal"))
          .orderBy($"c_nationkey")
      },
      Some(s"""
        SELECT c_nationkey, COUNT(*) AS numcust, ${SUM("c_acctbal")} AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT ${AVG("c_acctbal")} FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey ORDER BY c_nationkey"""),
    ),

    // ---- sort / limit / top-k ----
    QueryDef(
      "q23_topk_orders",
      (s, dir) => {
        import s.implicits._
        ord(s, dir)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice",
            date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"))
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(100)
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
    ),

    // ---- set operations: INTERSECT / EXCEPT / UNION ----
    QueryDef(
      "q24_set_ops_nations",
      (s, dir) => {
        import s.implicits._
        val cn = cust(s, dir).select($"c_nationkey".as("nk")).distinct()
        val sn = supp(s, dir).select($"s_nationkey".as("nk")).distinct()
        val both = cn.intersect(sn).withColumn("op", lit("intersect"))
        val onlyC = cn.except(sn).withColumn("op", lit("except"))
        both.unionAll(onlyC).select($"op", $"nk").orderBy($"op", $"nk")
      },
      Some("""
        SELECT 'intersect' AS op, nk FROM (
          SELECT DISTINCT c_nationkey AS nk FROM customer
          INTERSECT SELECT DISTINCT s_nationkey FROM supplier) a
        UNION ALL
        SELECT 'except' AS op, nk FROM (
          SELECT DISTINCT c_nationkey AS nk FROM customer
          EXCEPT SELECT DISTINCT s_nationkey FROM supplier) b
        ORDER BY op, nk"""),
    ),

    // ---- rollup ----
    QueryDef(
      "q25_rollup_acctbal",
      (s, dir) => {
        import s.implicits._
        cust(s, dir)
          .join(broadcast(nat(s, dir)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(reg(s, dir)), $"n_regionkey" === $"r_regionkey")
          .rollup($"r_name", $"n_name")
          .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("total_bal"))
          .select(coalesce($"r_name", lit("(all)")).as("region"),
            coalesce($"n_name", lit("(all)")).as("nation"),
            $"n_cust", $"total_bal")
          .orderBy($"region", $"nation")
      },
      Some(s"""
        SELECT COALESCE(r_name,'(all)') AS region, COALESCE(n_name,'(all)') AS nation,
               COUNT(*) AS n_cust, ${SUM("c_acctbal")} AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name) ORDER BY region, nation"""),
    ),

    // ---- cube ----
    QueryDef(
      "q26_cube_orders",
      (s, dir) => {
        import s.implicits._
        ord(s, dir)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
          .select(coalesce($"o_orderstatus", lit("(all)")).as("status"),
            coalesce($"o_orderpriority", lit("(all)")).as("priority"),
            $"n_orders", $"total_price")
          .orderBy($"status", $"priority")
      },
      Some(s"""
        SELECT COALESCE(o_orderstatus,'(all)') AS status,
               COALESCE(o_orderpriority,'(all)') AS priority,
               COUNT(*) AS n_orders, ${SUM("o_totalprice")} AS total_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority"""),
    ),

    // ---- window: running/lag/lead over customer order history ----
    QueryDef(
      "q27_order_history_window",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        ord(s, dir).filter($"o_custkey" % 100 === 0)
          .withColumn("order_seq", row_number().over(w))
          .withColumn("running_spend",
            dec2dbl(sum($"o_totalprice".cast(dec))
              .over(w.rowsBetween(Window.unboundedPreceding, 0))))
          .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
          .withColumn("next_price", lead($"o_totalprice", 1).over(w))
          .select($"o_custkey", $"o_orderkey", $"order_seq", $"running_spend",
            $"prev_price", $"next_price")
          .orderBy($"o_custkey", $"order_seq")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
          ROW_NUMBER() OVER w AS order_seq,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10)))
               OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_spend,
          LAG(o_totalprice, 1) OVER w AS prev_price,
          LEAD(o_totalprice, 1) OVER w AS next_price
        FROM orders WHERE o_custkey % 100 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, order_seq"""),
    ),

    // ---- window: ntile deciles ----
    QueryDef(
      "q28_acctbal_deciles",
      (s, dir) => {
        import s.implicits._
        // NOT ntile(10) over an unpartitioned window (whole table through one
        // task). Same two-pass rank as p07/p09: range-repartition + sort
        // within partitions (a distributed sort), zipWithIndex (per-partition
        // counts + offset), then the closed-form ntile bucket from (rank, n):
        // the first n%10 buckets get ceil(n/10) rows — SQL NTILE exactly.
        // At sf0.1 this costs ~0.4s more than the window form (two jobs +
        // an RDD hop vs one task) — the deliberate trade: the window form's
        // single task is what melts at 100x, this shape's cost is flat.
        val sorted = cust(s, dir).select($"c_acctbal", $"c_custkey")
          .repartitionByRange(8, $"c_acctbal", $"c_custkey")
          .sortWithinPartitions($"c_acctbal", $"c_custkey")
          // cache the sorted partitions: count() and zipWithIndex would
          // otherwise each re-run the full shuffle+sort from lineage
          .persistOnce()
        val n = sorted.count() // distributed count; table stats at scale
        val (q10, rem) = (n / 10L, n % 10L)
        val big = q10 + 1L
        val ranked = s.createDataFrame(
          sorted.as[(Double, Long)].rdd.zipWithIndex
            .map { case ((bal, _), r) => (bal, r) })
          .toDF("c_acctbal", "r")
        ranked
          .withColumn("decile",
            (when($"r" < lit(rem * big), expr(s"r DIV $big"))
              .otherwise(lit(rem) +
                expr(s"(r - ${rem * big}) DIV ${math.max(q10, 1L)}")) + 1L)
              .cast("int"))
          .groupBy($"decile")
          .agg(count(lit(1)).as("n"), min($"c_acctbal").as("min_bal"),
            max($"c_acctbal").as("max_bal"), davg($"c_acctbal").as("avg_bal"))
          .orderBy($"decile")
      },
      Some(s"""
        SELECT decile, COUNT(*) AS n, MIN(c_acctbal) AS min_bal,
               MAX(c_acctbal) AS max_bal, ${AVG("c_acctbal")} AS avg_bal
        FROM (SELECT c_acctbal, NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
              FROM customer) x
        GROUP BY decile ORDER BY decile"""),
    ),

    // ---- distinct aggregation ----
    QueryDef(
      "q29_distinct_counts",
      (s, dir) => {
        import s.implicits._
        li(s, dir).agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_returnflag", $"l_linestatus").as("n_flag_status"))
      },
      Some("""
        SELECT COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
        FROM lineitem"""),
    ),

    // ---- approx distinct (HLL). The estimate itself is approximate by
    // design, so the checkable contract is the HLL error bound: emit 0/1
    // flags for |approx − exact| ≤ 15%·exact (default rsd is 5%; 15% gives
    // 3σ headroom, still a real assertion — a broken sketch is off by 10×).
    // Oracle = the same flags computed in SQL, which are constant-true when
    // the sketch honors its bound.
    QueryDef(
      "q30_approx_distinct",
      (s, dir) => {
        import s.implicits._
        // Expand-free (r18): two countDistincts on DIFFERENT keys made
        // the planner Expand every lineitem row 3x through one exchange.
        // Per key: map-side partial dedup (distinct = partial-combined
        // hash agg, so the exchange carries unique keys per partition,
        // not rows), then count + the HLL sketch over the deduped keys —
        // an HLL register set is insert-idempotent, so the sketch (and
        // its estimate) over distinct values is bit-identical to the
        // sketch over all rows. The isNotNull guard keeps count(*) over
        // the deduped set exactly countDistinct (both drop NULLs).
        def arm(key: String, a: String, e: String) =
          li(s, dir).select(col(key)).where(col(key).isNotNull).distinct()
            .agg(approx_count_distinct(col(key)).as(a), count(lit(1)).as(e))
        arm("l_partkey", "ap", "ep").crossJoin(arm("l_orderkey", "ao", "eo"))
          .select(
            (abs($"ap" - $"ep") <= $"ep" * 0.15).cast("long").as("parts_in_bounds"),
            (abs($"ao" - $"eo") <= $"eo" * 0.15).cast("long").as("orders_in_bounds"))
      },
      Some("""
        SELECT CAST(1 AS BIGINT) AS parts_in_bounds,
               CAST(1 AS BIGINT) AS orders_in_bounds
        FROM (SELECT COUNT(DISTINCT l_partkey) FROM lineitem)"""),
    ),

    // ---- scalar function coverage: strings / dates / math / casewhen ----
    QueryDef(
      "q31_scalar_functions",
      (s, dir) => {
        import s.implicits._
        part(s, dir).filter($"p_partkey" <= 100)
          .select(
            $"p_partkey",
            upper($"p_name").as("uname"),
            lower($"p_brand").as("lbrand"),
            length($"p_name").as("name_len"),
            substring($"p_name", 1, 8).as("name_pref"),
            concat($"p_brand", lit("/"), $"p_type").as("brand_type"),
            regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
            abs($"p_retailprice" - 1000.0).as("abs_diff"),
            floor($"p_retailprice").as("price_floor"),
            ceil($"p_retailprice").as("price_ceil"),
            ($"p_partkey" % 7).as("key_mod"),
            when($"p_size" < 10, "small").when($"p_size" < 30, "medium")
              .otherwise("large").as("size_class"))
          .orderBy($"p_partkey")
      },
      Some("""
        SELECT p_partkey,
               UPPER(p_name) AS uname, LOWER(p_brand) AS lbrand,
               LENGTH(p_name) AS name_len, SUBSTRING(p_name, 1, 8) AS name_pref,
               p_brand || '/' || p_type AS brand_type,
               REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
               ABS(p_retailprice - 1000.0) AS abs_diff,
               CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
               CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
               p_partkey % 7 AS key_mod,
               CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium'
                    ELSE 'large' END AS size_class
        FROM part WHERE p_partkey <= 100 ORDER BY p_partkey"""),
    ),

    // ---- date function coverage ----
    QueryDef(
      "q32_date_functions",
      (s, dir) => {
        import s.implicits._
        ord(s, dir).filter($"o_orderkey" <= 200)
          .select(
            $"o_orderkey",
            year($"o_orderdate").as("o_year"),
            month($"o_orderdate").as("o_month"),
            dayofmonth($"o_orderdate").as("o_day"),
            quarter($"o_orderdate").as("o_quarter"),
            datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date")).as("days_since_epoch0"),
            date_format(date_add($"o_orderdate".cast("date"), 30), "yyyy-MM-dd").as("due_date"),
            date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("order_month"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS INT) AS o_year,
               CAST(MONTH(o_orderdate) AS INT) AS o_month,
               CAST(DAY(o_orderdate) AS INT) AS o_day,
               CAST(QUARTER(o_orderdate) AS INT) AS o_quarter,
               CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch0,
               strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
               strftime(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month
        FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey"""),
    ),

    // ---- IN-subquery (SQL surface via spark.sql) ----
    QueryDef(
      "q33_in_subquery",
      (s, dir) => {
        ord(s, dir).createOrReplaceTempView("g_orders")
        cust(s, dir).createOrReplaceTempView("g_customer")
        s.sql("""
          SELECT o_orderstatus, COUNT(*) AS n
          FROM g_orders
          WHERE o_custkey IN (SELECT c_custkey FROM g_customer
                              WHERE c_mktsegment = 'BUILDING')
          GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    ),

    // ---- anti join (NOT IN semantics over keys) ----
    QueryDef(
      "q34_anti_join",
      (s, dir) => {
        import s.implicits._
        cust(s, dir)
          // see q22: restrict to URGENT orders so the anti-join is non-empty
          .join(ord(s, dir).filter($"o_orderpriority" === "1-URGENT").select($"o_custkey"),
            $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("customers_without_urgent_orders"))
          .orderBy($"c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS customers_without_urgent_orders
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    ),

    // ---- cross join (small dims) ----
    QueryDef(
      "q35_cross_join_matrix",
      (s, dir) => {
        import s.implicits._
        reg(s, dir).crossJoin(nat(s, dir))
          .select($"r_name", $"n_name",
            ($"n_regionkey" === $"r_regionkey").as("is_member"))
          .orderBy($"r_name", $"n_name")
      },
      Some("""
        SELECT r_name, n_name, n_regionkey = r_regionkey AS is_member
        FROM region CROSS JOIN nation ORDER BY r_name, n_name"""),
    ),

    // ---- union-all + distinct over heterogeneous entities ----
    QueryDef(
      "q36_union_entities",
      (s, dir) => {
        import s.implicits._
        val c = cust(s, dir).select($"c_nationkey".as("nationkey"), lit("customer").as("kind"))
        val sp = supp(s, dir).select($"s_nationkey".as("nationkey"), lit("supplier").as("kind"))
        c.unionAll(sp).groupBy($"nationkey", $"kind").agg(count(lit(1)).as("n"))
          .orderBy($"nationkey", $"kind")
      },
      Some("""
        SELECT nationkey, kind, COUNT(*) AS n FROM (
          SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier) x
        GROUP BY nationkey, kind ORDER BY nationkey, kind"""),
    ),

    // ---- window over aggregate output (ratio-to-report) ----
    QueryDef(
      "q39_revenue_share",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"r_name")
        li(s, dir)
          .join(ord(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust(s, dir)), $"o_custkey" === $"c_custkey")
          .join(broadcast(nat(s, dir)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(reg(s, dir)), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(dsumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
          // window over the (tiny) aggregate output: share of region total
          .withColumn("region_rev", sum($"rev").over(w))
          // share computed in DOUBLE over the exact decimal sums — decimal
          // division result precision/scale rules differ between engines
          .select($"r_name", $"n_name",
            dec2dbl($"rev").as("revenue"),
            (dec2dbl($"rev") * lit(100.0) / dec2dbl($"region_rev")).as("share_pct"))
          .orderBy($"r_name", $"n_name")
      },
      Some(s"""
        WITH nrev AS (
          SELECT r_name, n_name,
                 SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))) AS rev
          FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name)
        SELECT r_name, n_name, ${DEC2DBL("rev")} AS revenue,
               ${DEC2DBL("rev")} * 100.0
                 / ${DEC2DBL("SUM(rev) OVER (PARTITION BY r_name)")} AS share_pct
        FROM nrev ORDER BY r_name, n_name"""),
    ),

    // ---- exact quantiles (sort-based aggregate) ----
    // Spark `percentile` and DuckDB `quantile_cont` share the same exact
    // definition (index p·(n-1), linear interpolation), so the doubles
    // tie out bit-for-bit. At 100 TB the exact form requires a per-group
    // sort — the scale swap is approx_percentile (t-digest), same plan
    // shape, documented here rather than benched because the oracle
    // can't replay a sketch.
    QueryDef(
      "q38_quantity_quantiles",
      (s, dir) => {
        import s.implicits._
        li(s, dir)
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            expr("percentile(l_quantity, 0.25)").as("q25"),
            expr("percentile(l_quantity, 0.5)").as("q50"),
            expr("percentile(l_quantity, 0.75)").as("q75"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n,
               quantile_cont(l_quantity, 0.25) AS q25,
               quantile_cont(l_quantity, 0.5) AS q50,
               quantile_cont(l_quantity, 0.75) AS q75
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    ),

    // ---- non-equi range join (broadcast nested-loop, the RIGHT plan) ----
    // Price-band bucketing: parts join a tiny derived band table on a
    // range predicate (no equi-key). Spark picks BroadcastNestedLoopJoin
    // because the band side is broadcast() — at 100 TB the fact scan
    // streams once past an in-memory 6-row table; the wrong plan here
    // (shuffle + cartesian) is what range joins degrade to when the small
    // side isn't broadcast. Bands derive from `region` so the oracle sees
    // the identical input (no synthesized literals).
    QueryDef(
      "q37_price_band_rangejoin",
      (s, dir) => {
        import s.implicits._
        val bands = reg(s, dir)
          .select($"r_regionkey".cast("int").as("band"))
          .withColumn("lo", lit(900.0) + $"band" * 25.0)
          .withColumn("hi", lit(900.0) + ($"band" + 1) * 25.0)
        part(s, dir)
          .join(broadcast(bands), $"p_retailprice" >= $"lo" && $"p_retailprice" < $"hi")
          .groupBy($"band")
          .agg(count(lit(1)).as("n_parts"),
            graft.sqlx.dsum($"p_retailprice").as("sum_price"))
          .orderBy($"band")
      },
      Some(s"""
        SELECT band, COUNT(*) AS n_parts, ${graft.sqlx.SUM("p_retailprice")} AS sum_price
        FROM part JOIN (
          SELECT CAST(r_regionkey AS INT) AS band,
                 900.0 + r_regionkey * 25.0 AS lo, 900.0 + (r_regionkey + 1) * 25.0 AS hi
          FROM region) bands
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band ORDER BY band"""),
    ),

    // ---- q40: TPC-H q21 shape — EXISTS + NOT EXISTS correlated on the ----
    // ---- same fact table ("suppliers who kept orders waiting")        ----
    // The oracle states it as the two correlated subqueries; the Spark plan
    // is the decorrelation that survives 100 TB: ONE lineitem⋈orders join,
    // per-(order, supplier) late-row counts, then per-order supplier/
    // late-supplier counts as WINDOW aggregates over the orderkey clustering
    // — every exchange past the join moves only the small per-(order,
    // supplier) aggregate, the fact table is scanned once and never
    // self-joined row-to-row. EXISTS/NOT-EXISTS becomes
    // n_supp > 1 && n_late_supp == 1.
    QueryDef(
      "q40_waiting_suppliers",
      (s, dir) => {
        import s.implicits._
        val lo = li(s, dir)
          .join(ord(s, dir).filter($"o_orderstatus" === "F"),
            $"l_orderkey" === $"o_orderkey")
          .withColumn("late",
            ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS")).cast("int"))
        val perOS = lo.groupBy($"l_orderkey", $"l_suppkey")
          .agg(sum($"late").as("late_rows"))
        val w = Window.partitionBy($"l_orderkey")
        perOS
          .withColumn("n_supp", count(lit(1)).over(w))
          .withColumn("n_late_supp", sum(($"late_rows" > 0).cast("int")).over(w))
          .filter($"late_rows" > 0 && $"n_supp" > 1 && $"n_late_supp" === 1)
          .join(broadcast(supp(s, dir)), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(nat(s, dir)), $"s_nationkey" === $"n_nationkey")
          .groupBy($"n_name", $"s_name")
          .agg(sum($"late_rows").as("numwait"))
          .orderBy($"numwait".desc, $"n_name", $"s_name")
          .limit(50)
      },
      Some("""
        SELECT n_name, s_name, count(*) AS numwait
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY n_name, s_name
        ORDER BY numwait DESC, n_name, s_name
        LIMIT 50"""),
    ),

    // ---- q41: TPC-H q20 shape — IN-subquery wrapping a correlated ----
    // ---- scalar-aggregate subquery ("dominant supplier of a part") ----
    // The oracle nests sum-per-(supplier, part) HAVING > 0.2 * correlated
    // per-part total; Spark decorrelates to ONE partkey/suppkey-shuffle
    // aggregate, derives the per-part total as a WINDOW over that
    // aggregate's partkey clustering (no second fact scan), and semi-joins
    // supplier. l_quantity values are integral doubles, so every sum is
    // exact and the 0.2-share comparison is deterministic in both engines.
    QueryDef(
      "q41_dominant_supplier",
      (s, dir) => {
        import s.implicits._
        val perPS = li(s, dir).groupBy($"l_partkey", $"l_suppkey")
          .agg(sum($"l_quantity").as("ps_qty"))
        // per-part total as a WINDOW over the same partkey clustering — a
        // groupBy-then-join would recompute the whole lineitem aggregate
        // for the second branch (Spark does not reuse subtrees)
        val candidates = perPS
          .withColumn("p_qty",
            sum($"ps_qty").over(Window.partitionBy($"l_partkey")))
          .join(broadcast(part(s, dir).filter($"p_name".like("%a%"))),
            $"p_partkey" === $"l_partkey")
          .filter($"ps_qty" > lit(0.2) * $"p_qty")
          .select($"l_suppkey").distinct()
        supp(s, dir)
          .join(candidates, $"s_suppkey" === $"l_suppkey", "left_semi")
          .select($"s_name", $"s_acctbal")
          .orderBy($"s_name")
      },
      Some("""
        SELECT s_name, s_acctbal FROM supplier WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE '%a%'
          GROUP BY l_suppkey, l_partkey
          HAVING sum(l_quantity) > 0.2 * (SELECT sum(l2.l_quantity) FROM lineitem l2
                                          WHERE l2.l_partkey = lineitem.l_partkey))
        ORDER BY s_name"""),
    ),

    // ---- time-RANGE window: trailing 90-day spend per customer ----
    // The frame q27 can't express: ROWS BETWEEN counts rows, this frame
    // is bounded by event-time distance (RANGE BETWEEN 90 PRECEDING over
    // epoch days) — trailing-period spend, the rolling-metric shape. One
    // shuffle on the partition key, then a sorted range-frame scan per
    // partition; ties on the order key share a frame in both engines, so
    // the decimal-accumulated sum stays hash-stable.
    QueryDef(
      "q42_trailing_window",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"epoch_day")
          .rangeBetween(-90, 0)
        ord(s, dir).filter($"o_custkey" % 100 === 0)
          .withColumn("epoch_day",
            datediff(to_date($"o_orderdate"), to_date(lit("1970-01-01"))).cast("long"))
          .withColumn("trailing_n", count(lit(1)).over(w))
          .withColumn("trailing_spend", dec2dbl(sum($"o_totalprice".cast(dec)).over(w)))
          .select($"o_custkey", $"o_orderkey", $"epoch_day",
            $"trailing_n", $"trailing_spend")
          .orderBy($"o_custkey", $"epoch_day", $"o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS epoch_day,
               COUNT(*) OVER w AS trailing_n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER w AS VARCHAR) AS DOUBLE) AS trailing_spend
        FROM orders WHERE o_custkey % 100 = 0
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                     RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, epoch_day, o_orderkey"""),
    ),

    // ---- q43: arbitrary GROUPING SETS (not expressible as rollup/cube) --
    // Four hand-picked aggregation lattices in ONE pass — (flag, status),
    // (flag, shipyear), (shipyear), and the grand total — with
    // grouping_id() disambiguating which lattice a row belongs to (a NULL
    // group value vs a nulled-out grouping column). q25/q26 cover the
    // rollup/cube special cases; this is the general form. Spark expands
    // the sets with a single Expand node feeding one hash aggregate —
    // lineitem is scanned ONCE and shuffles once on the (expanded)
    // grouping key, exactly what four separate GROUP BYs + UNION would
    // not do. Revenue goes through the exact decimal accumulator.
    QueryDef(
      "q43_grouping_sets",
      (s, dir) => {
        import s.implicits._
        li(s, dir)
          .withColumn("shipyear", year($"l_shipdate").cast("int"))
          .groupingSets(
            Seq(
              Seq($"l_returnflag", $"l_linestatus"),
              Seq($"l_returnflag", $"shipyear"),
              Seq($"shipyear"),
              Seq()),
            $"l_returnflag", $"l_linestatus", $"shipyear")
          .agg(
            grouping_id().cast("long").as("grp"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy($"grp", $"l_returnflag", $"l_linestatus", $"shipyear")
      },
      Some(s"""
        WITH b AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS shipyear,
                 l_extendedprice, l_discount
          FROM lineitem)
        SELECT l_returnflag, l_linestatus, shipyear,
               CAST(GROUPING(l_returnflag, l_linestatus, shipyear) AS BIGINT) AS grp,
               ${SUM("l_extendedprice*(1.0-l_discount)")} AS revenue,
               COUNT(*) AS n
        FROM b
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag, shipyear), (shipyear), ())
        ORDER BY grp, l_returnflag, l_linestatus, shipyear"""),
    ),

    // ---- q44: UNPIVOT — wide measures to long (measure, value) form ----
    // The inverse of e04's pivot: a per-priority aggregate with three
    // measure COLUMNS is melted into (o_orderpriority, measure, value)
    // rows via `stack` — Spark's Generate-based unpivot, a narrow 3x
    // fan-out of an already-tiny aggregate (the melt never touches the
    // fact table; at 100 TB the wide aggregate is the only shuffle).
    // Measures are cast to one DOUBLE column (the melt's type contract);
    // each came through the exact decimal accumulator first.
    QueryDef(
      "q44_unpivot",
      (s, dir) => {
        import s.implicits._
        ord(s, dir)
          .groupBy($"o_orderpriority")
          .agg(
            count(lit(1)).cast("double").as("n_orders"),
            dsum($"o_totalprice").as("total_price"),
            davg($"o_totalprice").as("avg_price"))
          .select($"o_orderpriority", expr(
            """stack(3, 'n_orders', n_orders,
                        'total_price', total_price,
                        'avg_price', avg_price) AS (measure, value)"""))
          .orderBy($"o_orderpriority", $"measure")
      },
      Some(s"""
        WITH wide AS (
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS DOUBLE) AS n_orders,
                 ${SUM("o_totalprice")} AS total_price,
                 ${AVG("o_totalprice")} AS avg_price
          FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, measure, value FROM (
          SELECT o_orderpriority, 'n_orders' AS measure, n_orders AS value FROM wide
          UNION ALL
          SELECT o_orderpriority, 'total_price', total_price FROM wide
          UNION ALL
          SELECT o_orderpriority, 'avg_price', avg_price FROM wide) u
        ORDER BY o_orderpriority, measure"""),
    ),

    // ---- q45: bag-semantics set operations (EXCEPT ALL / INTERSECT ALL) --
    // q24 covers the DISTINCT set ops; these are the multiset forms —
    // duplicates carry MULTIPLICITY (except-all subtracts per-key counts,
    // intersect-all keeps the minimum), which Spark executes as a
    // count-and-replicate (Generate over per-key counts), not a dedup.
    // The multisets: high-quantity lineitem partkeys vs returned-flag
    // partkeys. Output is the per-key multiplicity surviving each op —
    // collapsing the replicated rows back to counts keeps the result
    // small and deterministic while still exercising the bag pipeline.
    QueryDef(
      "q45_bag_set_ops",
      (s, dir) => {
        import s.implicits._
        // Bag EXCEPT/INTERSECT as COUNTING arithmetic: for key k with ca
        // copies in a and cb in b, EXCEPT ALL keeps max(ca-cb, 0) and
        // INTERSECT ALL min(ca, cb) — so one partial-combined aggregate
        // per side plus one key join replaces Spark's ExceptAll/
        // IntersectAll rewrites, which shuffle every ROW of both inputs
        // (tag + row_number machinery) before any reduction. Same
        // (op, key, n) rows out.
        val ca = li(s, dir).filter($"l_quantity" >= 45)
          .groupBy($"l_partkey").agg(count(lit(1)).as("ca"))
        val cb = li(s, dir).filter($"l_returnflag" === "R")
          .groupBy($"l_partkey").agg(count(lit(1)).as("cb"))
        // one pass over the joined counts (r18): the union of two filtered
        // reads re-ran BOTH aggregates + the key join per arm; a
        // conditional explode emits the except/intersect rows a key owes
        // in the same pass — same (op, key, n) rows out.
        // NULL-key contract (r17 ADVICE): this USING join is null-UNSAFE
        // while exceptAll/intersectAll treat NULL keys as equal; the
        // rewrite leans on TPC-H's NOT NULL l_partkey — a nullable key
        // column would need a null-safe (<=>) join here.
        ca.join(cb, Seq("l_partkey"), "full_outer")
          .select($"l_partkey",
            coalesce($"ca", lit(0L)).as("ca"), coalesce($"cb", lit(0L)).as("cb"))
          .select($"l_partkey", explode(array(
            when($"ca" > $"cb",
              struct(lit("except_all").as("op"), ($"ca" - $"cb").as("n"))),
            when($"ca" >= 1L && $"cb" >= 1L,
              struct(lit("intersect_all").as("op"), least($"ca", $"cb").as("n")))
          )).as("e"))
          .filter($"e".isNotNull)
          .select($"e.op".as("op"), $"l_partkey", $"e.n".as("n"))
          .orderBy($"op", $"l_partkey")
      },
      Some("""
        WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45),
        b AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
        ex AS (
          SELECT 'except_all' AS op, l_partkey, COUNT(*) AS n
          FROM (SELECT l_partkey FROM a EXCEPT ALL SELECT l_partkey FROM b) x
          GROUP BY l_partkey),
        ins AS (
          SELECT 'intersect_all' AS op, l_partkey, COUNT(*) AS n
          FROM (SELECT l_partkey FROM a INTERSECT ALL SELECT l_partkey FROM b) y
          GROUP BY l_partkey)
        SELECT op, l_partkey, n FROM ex
        UNION ALL
        SELECT op, l_partkey, n FROM ins
        ORDER BY op, l_partkey"""),
    ),

    // ---- q46: top-k per key via the CUSTOM physical operator ----
    // Runs `graft.plans.TopK.perKey` — the two-phase bounded-heap
    // LogicalPlan/SparkStrategy/SparkPlan stack — under the DuckDB hash
    // gate: the oracle is the window rank-filter the operator replaces,
    // so a hash match proves the custom execution path end-to-end (exact
    // per-key results, all ties broken). See TopKPerKeySpec for the plan
    // shape (partial → exchange → final, no WindowExec, no sort).
    QueryDef(
      "q46_topk_per_group",
      (s, dir) => {
        import s.implicits._
        graft.plans.TopK.perKey(
          li(s, dir).filter($"l_partkey" % 20 === 0),
          Seq("l_partkey"),
          Seq("l_extendedprice" -> false, "l_orderkey" -> true,
            "l_linenumber" -> true), 3)
          .select($"l_partkey", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
          .orderBy($"l_partkey", $"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      },
      Some("""
        SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice FROM (
          SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
                 ROW_NUMBER() OVER (PARTITION BY l_partkey
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
          FROM lineitem WHERE l_partkey % 20 = 0) x
        WHERE rn <= 3
        ORDER BY l_partkey, l_extendedprice DESC, l_orderkey, l_linenumber"""),
    ),

    // ---- q47: Z-order layout clustering report ----
    // The data-layout decision a 100 TB table owner actually makes: sort
    // files by ONE column (perfect pruning on it, none on the other) or by
    // the Z-order (Morton) key (tight per-file min/max on BOTH). This
    // query measures that trade on lineitem's (l_partkey, l_suppkey)
    // plane: rows bucket into 64 "files" under each layout — linear =
    // top bits of x, zorder = top bits of the native `interleave_bits`
    // key (graft.functions.InterleaveBits — bucketing is a pure bit-shift
    // expression, NO global sort or unpartitioned window) — and per
    // layout we report the summed per-bucket min/max span of each
    // dimension (as a fraction of the 1024-wide domain) plus how many
    // buckets a `y < 64` range predicate must touch. Linear touches
    // every bucket for the non-leading dimension; Z-order bounds both
    // spans and prunes the y-query to the y-high-bit octants — the
    // measured justification for OPTIMIZE-ZORDER-style layouts, with all
    // arithmetic exact integers until two final divisions.
    QueryDef(
      "q47_zorder_layout",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.graft.ColumnBridge
        val li = t(s, dir, "lineitem").select(
          (col("l_partkey") % 1024L).cast("long").as("x"),
          (col("l_suppkey") % 1024L).cast("long").as("y"))
        val zkey = ColumnBridge.column(graft.functions.InterleaveBits(
          ColumnBridge.expression(col("x")), ColumnBridge.expression(col("y"))))
        def report(bucketed: DataFrame, layout: String): DataFrame =
          bucketed.groupBy($"bucket").agg(
            min($"x").as("min_x"), max($"x").as("max_x"),
            min($"y").as("min_y"), max($"y").as("max_y"))
            .agg(
              count(lit(1)).as("n_buckets"),
              sum($"max_x" - $"min_x" + 1L).as("sum_span_x"),
              sum($"max_y" - $"min_y" + 1L).as("sum_span_y"),
              sum(when($"min_y" < 64L, 1L).otherwise(0L)).as("buckets_touched_yq"))
            .select(lit(layout).as("layout"), $"n_buckets",
              ($"sum_span_x".cast("double") / ($"n_buckets" * 1024L)).as("avg_span_x_frac"),
              ($"sum_span_y".cast("double") / ($"n_buckets" * 1024L)).as("avg_span_y_frac"),
              $"buckets_touched_yq")
        val linear = li.withColumn("bucket", shiftright($"x", 4))
        val zorder = li.withColumn("bucket", shiftright(zkey, 14))
        report(linear, "linear").union(report(zorder, "zorder"))
          .orderBy($"layout")
      },
      Some("""
        WITH pts AS (
          SELECT CAST(l_partkey % 1024 AS BIGINT) AS x,
                 CAST(l_suppkey % 1024 AS BIGINT) AS y
          FROM lineitem),
        keyed AS (
          SELECT x, y,
                 CAST(list_sum(list_transform(range(10), i ->
                   (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i + 1))))
                   AS BIGINT) AS z
          FROM pts),
        lin AS (
          SELECT x >> 4 AS bucket, MIN(x) AS min_x, MAX(x) AS max_x,
                 MIN(y) AS min_y, MAX(y) AS max_y
          FROM keyed GROUP BY 1),
        zo AS (
          SELECT z >> 14 AS bucket, MIN(x) AS min_x, MAX(x) AS max_x,
                 MIN(y) AS min_y, MAX(y) AS max_y
          FROM keyed GROUP BY 1),
        rep AS (
          SELECT 'linear' AS layout, CAST(COUNT(*) AS BIGINT) AS n_buckets,
                 CAST(SUM(max_x - min_x + 1) AS DOUBLE)/(COUNT(*)*1024) AS avg_span_x_frac,
                 CAST(SUM(max_y - min_y + 1) AS DOUBLE)/(COUNT(*)*1024) AS avg_span_y_frac,
                 CAST(SUM(CASE WHEN min_y < 64 THEN 1 ELSE 0 END) AS BIGINT) AS buckets_touched_yq
          FROM lin
          UNION ALL
          SELECT 'zorder', CAST(COUNT(*) AS BIGINT),
                 CAST(SUM(max_x - min_x + 1) AS DOUBLE)/(COUNT(*)*1024),
                 CAST(SUM(max_y - min_y + 1) AS DOUBLE)/(COUNT(*)*1024),
                 CAST(SUM(CASE WHEN min_y < 64 THEN 1 ELSE 0 END) AS BIGINT)
          FROM zo)
        SELECT layout, n_buckets, avg_span_x_frac, avg_span_y_frac,
               buckets_touched_yq
        FROM rep ORDER BY layout"""),
    ),

    // ---- q48: grouped quantile sketch (scalable percentiles, no sort) ----
    // The scale-honest answer to "what's the p50/p90/p99 price per return
    // flag": an exact global percentile needs a total sort (or an
    // unpartitioned rank window — banned at scale); the mergeable sketch
    // shape is ONE map-side-combined histogram aggregate over fixed log2
    // buckets (t13's binary-width trick on integer cents), then all
    // quantile math happens on the ≤64-rows-per-group histogram: a
    // per-group cumulative window (PARTITIONED by the group key — never
    // global), a 3-way threshold fan-out, and a min(struct) pick of the
    // first bucket whose cumulative count reaches ceil(p·n/100). Returns
    // the bucket's [lo, hi] bracket — the sketch's honest ±bucket-width
    // answer. Floor(x·100) on the SAME IEEE double product keeps Spark
    // and DuckDB on identical cents. 100 TB: the corpus-sized work is
    // the one histogram agg; everything after is per-group constant.
    QueryDef(
      "q48_quantile_sketch",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val cum = Window.partitionBy($"l_returnflag").orderBy($"blen")
          .rowsBetween(Window.unboundedPreceding, 0)
        val all = Window.partitionBy($"l_returnflag")
        val hist = t(s, dir, "lineitem")
          .select($"l_returnflag",
            floor($"l_extendedprice" * 100).cast("long").as("cents"))
          .withColumn("blen", length(bin($"cents")).cast("int"))
          .groupBy($"l_returnflag", $"blen")
          .agg(count(lit(1)).as("n_rows"))
          .withColumn("cum", sum($"n_rows").over(cum))
          .withColumn("n", sum($"n_rows").over(all))
        hist
          .withColumn("p", explode(array(lit(50L), lit(90L), lit(99L))))
          .filter($"cum" * 100L >= $"p" * $"n")
          .groupBy($"l_returnflag", $"p")
          .agg(min(struct($"blen", $"n")).as("m"))
          .select($"l_returnflag", $"p",
            $"m.blen".as("bucket"),
            expr("shiftleft(1L, m.blen - 1)").as("bucket_lo"),
            expr("shiftleft(1L, m.blen) - 1L").as("bucket_hi"),
            $"m.n".as("n_total"))
          .orderBy($"l_returnflag", $"p")
      },
      Some("""
        WITH c AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem),
        h AS (
          SELECT l_returnflag, CAST(length(bin(cents)) AS INT) AS blen,
                 COUNT(*) AS n_rows
          FROM c GROUP BY 1, 2),
        w AS (
          SELECT l_returnflag, blen, n_rows,
                 CAST(SUM(n_rows) OVER (PARTITION BY l_returnflag ORDER BY blen
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                 CAST(SUM(n_rows) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
          FROM h),
        q AS (
          SELECT l_returnflag, p, MIN(blen) AS bucket, MIN(n) AS n_total
          FROM w CROSS JOIN (SELECT unnest([CAST(50 AS BIGINT),
                                            CAST(90 AS BIGINT),
                                            CAST(99 AS BIGINT)]) AS p) ps
          WHERE cum * 100 >= p * n
          GROUP BY 1, 2)
        SELECT l_returnflag, p, bucket,
               CAST(1 << (bucket - 1) AS BIGINT) AS bucket_lo,
               CAST((1 << bucket) - 1 AS BIGINT) AS bucket_hi,
               n_total
        FROM q ORDER BY l_returnflag, p"""),
    ),

    // ---- q49: correlated scalar subqueries ----
    // Parts priced above their own brand's average — the classic
    // correlated-scalar-aggregate shape, written as TWO correlated
    // subqueries (COUNT and SUM against the outer row's brand) so the
    // comparison `price·n > Σprice` stays exact BIGINT-on-cents: a
    // floating AVG threshold could flip a row at the 1-ulp boundary
    // between engines. Catalyst decorrelates each scalar subquery into a
    // per-brand aggregate joined back on p_brand — the brand dimension is
    // tiny, so both rewritten joins broadcast; the part table is scanned,
    // never self-joined row-by-row. The same decorrelation machinery is
    // what q33 (IN) and q34 (NOT EXISTS) exercise for the other subquery
    // flavors — this closes the scalar case of the subquery matrix.
    QueryDef(
      "q49_correlated_scalar",
      (s, dir) => {
        part(s, dir).createOrReplaceTempView("g_part")
        s.sql("""
          SELECT p.p_brand, COUNT(*) AS n_above
          FROM g_part p
          WHERE CAST(floor(p.p_retailprice * 100) AS BIGINT) *
                (SELECT COUNT(*) FROM g_part p2 WHERE p2.p_brand = p.p_brand)
              > (SELECT SUM(CAST(floor(p3.p_retailprice * 100) AS BIGINT))
                 FROM g_part p3 WHERE p3.p_brand = p.p_brand)
          GROUP BY p.p_brand ORDER BY p.p_brand""")
      },
      Some("""
        SELECT p.p_brand, COUNT(*) AS n_above
        FROM part p
        WHERE CAST(floor(p.p_retailprice * 100) AS BIGINT) *
              (SELECT COUNT(*) FROM part p2 WHERE p2.p_brand = p.p_brand)
            > (SELECT SUM(CAST(floor(p3.p_retailprice * 100) AS BIGINT))
               FROM part p3 WHERE p3.p_brand = p.p_brand)
        GROUP BY p.p_brand ORDER BY p.p_brand"""),
    ),

    // ---- q50: the analytic-rank window functions ----
    // percent_rank / cume_dist / first_value / nth_value / last_value —
    // the window functions the rest of the inventory doesn't touch (q27
    // uses lag/lead/rank, q28 ntile-by-closed-form, q42/e25 frames).
    // Ordering key (cents, custkey) is unique within a nation, so every
    // rank function is tie-free and deterministic; percent_rank and
    // cume_dist are exact integer ratios evaluated as the same double
    // division in both engines. last_value gets the explicit
    // whole-partition frame — its default frame ends at CURRENT ROW in
    // both engines, which would make it the identity. Scale note: the
    // nation partition key is dimension-coarse (25 groups), so at 100 TB
    // each partition serializes one nation through one task — the same
    // coarse-partition caveat as e05, acceptable here because the output
    // contract IS per-nation full-partition analytics; for a
    // high-cardinality rank at scale use q28's two-pass
    // range-repartition rank instead.
    QueryDef(
      "q50_rank_functions",
      (s, dir) => {
        import s.implicits._
        val base = cust(s, dir)
          .select($"c_custkey", $"c_nationkey",
            floor($"c_acctbal" * 100).cast("long").as("cents"))
        val w = Window.partitionBy($"c_nationkey").orderBy($"cents", $"c_custkey")
        val wf = Window.partitionBy($"c_nationkey").orderBy($"cents", $"c_custkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        base.select($"c_custkey", $"c_nationkey", $"cents",
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first_value($"c_custkey").over(wf).as("poorest"),
          nth_value($"c_custkey", 2).over(wf).as("runner_up"),
          last_value($"c_custkey").over(wf).as("richest"))
          .orderBy($"c_nationkey", $"cents", $"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_nationkey,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               first_value(c_custkey) OVER wf AS poorest,
               nth_value(c_custkey, 2) OVER wf AS runner_up,
               last_value(c_custkey) OVER wf AS richest
        FROM customer
        WINDOW
          w AS (PARTITION BY c_nationkey
                ORDER BY CAST(floor(c_acctbal * 100) AS BIGINT), c_custkey),
          wf AS (PARTITION BY c_nationkey
                 ORDER BY CAST(floor(c_acctbal * 100) AS BIGINT), c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY c_nationkey, cents, c_custkey"""),
    ),
  )
}
