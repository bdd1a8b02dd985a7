package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational query pack: joins, aggregations, windows, set ops, grouping
  * sets, sorts — the declared analytics surface of the reference (SURVEY.md
  * §2 Tier B, the Metabase/Postgres SQL entry point of
  * /root/reference/README.md:20,98-106) exercised TPC-H-style over the
  * testdata star schema.
  *
  * Every query is written scale-first:
  *  - filters/projections sit directly on the parquet scan (pushdown),
  *  - small dimensions are broadcast (region/nation/supplier), large joins
  *    shuffle on their keys and AQE picks broadcast when a side is small,
  *  - aggregates are partial+final (map-side combine) by construction,
  *  - final ORDER BY runs on already-reduced results (driver-size output)
  *    and exists only to make oracle comparison deterministic.
  *
  * Numeric convention for oracle-exact results: see [[Q]].
  */
object Relational {
  import Q._

  // --- q01: TPC-H Q1-style pricing summary -------------------------------
  // Generalizes the reference's dashboard aggregation (grouped measures over
  // the fact table, /root/reference/README.md:43-45) to the classic
  // flag/status rollup: one scan, partial aggs, 6-group output.
  def q01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(money($"l_extendedprice") * oneMinus($"l_discount"))
          .cast("double").as("sum_disc_price"),
        sum(money($"l_extendedprice") * oneMinus($"l_discount") * onePlus($"l_tax"))
          .cast("double").as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0 - l_discount AS DECIMAL(5,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0 - l_discount AS DECIMAL(5,2)) * CAST(1.0 + l_tax AS DECIMAL(5,2))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- q02: scan with pushed filters (IN / BETWEEN / LIKE) ----------------
  def q02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .filter($"p_size".between(10, 20) &&
        $"p_type".isin("SMALL", "PROMO") &&
        $"p_name".like("%bolt%"))
      .select($"p_partkey", $"p_name", $"p_brand", $"p_type", $"p_size",
        $"p_retailprice")
      .orderBy($"p_partkey")
  }
  val q02Sql: String =
    """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
      |FROM part
      |WHERE p_size BETWEEN 10 AND 20 AND p_type IN ('SMALL','PROMO')
      |  AND p_name LIKE '%bolt%'
      |ORDER BY p_partkey""".stripMargin

  // --- q03: TPC-H Q3-style shipping priority (3-way join + top-k) --------
  // customer is the smallest side after its filter → AQE broadcasts it;
  // orders⋈lineitem shuffles on the order key (the natural 100 TB layout:
  // both sides bucketed/partitioned by orderkey makes this co-located).
  def q03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutoff = lit("1999-03-15").cast("timestamp")
    val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val o = Tables.orders(s, d).filter($"o_orderdate" < cutoff)
    val l = Tables.lineitem(s, d).filter($"l_shipdate" > cutoff)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(money($"l_extendedprice") * oneMinus($"l_discount"))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }
  val q03Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0 - l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-03-15'
      |  AND l_shipdate > TIMESTAMP '1999-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // --- q04: semi join (EXISTS) — order-priority counts -------------------
  def q04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
      .filter($"o_orderdate".between(
        lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
    val returned = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
      .select($"l_orderkey")
    o.join(returned, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }
  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- q05: TPC-H Q5-style 6-way join through region ---------------------
  // nation/region/supplier are true dimensions → broadcast explicitly; the
  // fact-side joins shuffle on orderkey/custkey.
  def q05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val r = Tables.region(s, d).filter($"r_name" === "ASIA")
    val n = Tables.nation(s, d)
    val sup = Tables.supplier(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
      $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey" &&
        $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(money($"l_extendedprice") * oneMinus($"l_discount"))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }
  val q05Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0 - l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // --- q06: TPC-H Q6-style selective scan + single agg -------------------
  // The canonical pushdown test: predicate reaches the parquet reader, only
  // 3 columns are read, result is one row.
  def q06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount".between(0.02, 0.06) && $"l_quantity" < 24)
      .agg(sum(money($"l_extendedprice") * frac($"l_discount"))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }
  val q06Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin

  // --- q07: anti join (NOT EXISTS) — the A8 upsert primitive -------------
  // Same shape as the reference's ON CONFLICT DO NOTHING load
  // (/root/reference/dags/crypto-etl-pipeline-psql.py:85-89): keep only rows
  // with no match on the key.
  def q07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val recent = Tables.orders(s, d)
      .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
      .select($"o_custkey")
    c.join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_inactive"),
        dsum($"c_acctbal").as("sum_acctbal"))
      .orderBy($"c_mktsegment")
  }
  val q07Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_inactive,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // --- q08: left outer join with per-key aggregation ---------------------
  def q08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_name", $"c_mktsegment")
      .agg(count($"o_orderkey").as("n_orders"),
        dsum4(coalesce($"o_totalprice", lit(0.0))).as("sum_spent"))
      .orderBy($"c_custkey")
  }
  val q08Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment, COUNT(o_orderkey) AS n_orders,
      |  ROUND(CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name, c_mktsegment
      |ORDER BY c_custkey""".stripMargin

  // --- q09: full outer join — nations vs supplier presence ---------------
  def q09(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = Tables.nation(s, d)
    val supAgg = Tables.supplier(s, d)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"), dsum($"s_acctbal").as("sum_bal"))
    n.join(supAgg, $"n_nationkey" === $"s_nationkey", "full_outer")
      .select(
        coalesce($"n_nationkey", $"s_nationkey").as("nationkey"),
        coalesce($"n_name", lit("(none)")).as("nation_name"),
        coalesce($"n_suppliers", lit(0L)).as("n_suppliers"),
        coalesce($"sum_bal", lit(0.0)).as("sum_bal"))
      .orderBy($"nationkey")
  }
  val q09Sql: String =
    """SELECT COALESCE(n_nationkey, s_nationkey) AS nationkey,
      |  COALESCE(n_name, '(none)') AS nation_name,
      |  COALESCE(n_suppliers, 0) AS n_suppliers,
      |  COALESCE(sum_bal, 0.0) AS sum_bal
      |FROM nation
      |FULL OUTER JOIN (
      |  SELECT s_nationkey, COUNT(*) AS n_suppliers,
      |    CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |  FROM supplier GROUP BY s_nationkey
      |) ON n_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  // --- q10: theta self-join — same-brand size-dominance pairs ------------
  // Non-equi condition on top of an equi key: Spark plans the p_brand
  // equality as the shuffle key and evaluates p_size < p_size as a join
  // residual, so this stays a hash join, not a cartesian product.
  def q10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = Tables.part(s, d).select($"p_partkey".as("a_key"),
      $"p_brand".as("brand"), $"p_size".as("a_size"))
    val b = Tables.part(s, d).select($"p_partkey".as("b_key"),
      $"p_brand".as("b_brand"), $"p_size".as("b_size"))
    a.join(b, $"brand" === $"b_brand" && $"a_size" < $"b_size")
      .groupBy($"brand")
      .agg(count(lit(1)).as("n_dominated_pairs"))
      .orderBy($"brand")
  }
  val q10Sql: String =
    """SELECT a.p_brand AS brand, COUNT(*) AS n_dominated_pairs
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_size < b.p_size
      |GROUP BY a.p_brand
      |ORDER BY brand""".stripMargin

  // --- q11: TPC-H Q10-style returned-item revenue, top 20 ----------------
  def q11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-07-01").cast("timestamp"))
    val l = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
    val n = Tables.nation(s, d)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name", $"c_mktsegment")
      .agg(sum(money($"l_extendedprice") * oneMinus($"l_discount"))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }
  val q11Sql: String =
    """SELECT c_custkey, c_name, n_name, c_mktsegment,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0 - l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-07-01'
      |GROUP BY c_custkey, c_name, n_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // --- q12: ROLLUP over region → nation with grouping labels -------------
  // grouping() folds the rollup NULLs into explicit labels so sort keys are
  // non-null (Spark and DuckDB default NULL ordering differs).
  def q12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(
        when(grouping($"r_name") === 1, "(all)").otherwise($"r_name").as("region_name"),
        when(grouping($"n_name") === 1, "(all)").otherwise($"n_name").as("nation_name"),
        count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_bal"))
      .select($"region_name", $"nation_name", $"n_customers", $"sum_bal")
      .orderBy($"region_name", $"nation_name")
  }
  val q12Sql: String =
    """SELECT
      |  CASE WHEN GROUPING(r_name) = 1 THEN '(all)' ELSE r_name END AS region_name,
      |  CASE WHEN GROUPING(n_name) = 1 THEN '(all)' ELSE n_name END AS nation_name,
      |  COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY region_name, nation_name""".stripMargin

  // --- q13: CUBE over order status × priority ----------------------------
  def q13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(
        when(grouping($"o_orderstatus") === 1, "(all)").otherwise($"o_orderstatus").as("status"),
        when(grouping($"o_orderpriority") === 1, "(all)").otherwise($"o_orderpriority").as("priority"),
        count(lit(1)).as("n_orders"), dsum4($"o_totalprice").as("sum_price"))
      .select($"status", $"priority", $"n_orders", $"sum_price")
      .orderBy($"status", $"priority")
  }
  val q13Sql: String =
    """SELECT
      |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
      |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
      |  COUNT(*) AS n_orders,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // --- q14: count distinct (exact) ---------------------------------------
  def q14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    o.join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        countDistinct($"o_custkey").as("n_active_customers"),
        countDistinct($"o_orderpriority").as("n_priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy($"c_mktsegment")
  }
  val q14Sql: String =
    """SELECT c_mktsegment,
      |  COUNT(DISTINCT o_custkey) AS n_active_customers,
      |  COUNT(DISTINCT o_orderpriority) AS n_priorities,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // --- q15: top-k per group via row_number -------------------------------
  def q15(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"rn")
  }
  val q15Sql: String =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin

  // --- q16: analytic windows — lag/lead deltas per customer --------------
  // The reference's hour-over-hour price-delta dashboard shape
  // (SURVEY.md §2 Tier B "window functions") over the orders history.
  def q16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, d)
      .filter($"o_custkey" < 200)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"),
        ($"o_totalprice" - lag($"o_totalprice", 1).over(w)).as("delta_prev"))
      .orderBy($"o_custkey", $"o_orderkey")
  }
  val q16Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  LAG(o_totalprice, 1) OVER w AS prev_price,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  o_totalprice - LAG(o_totalprice, 1) OVER w AS delta_prev
      |FROM orders
      |WHERE o_custkey < 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // --- q17: window frames — running + moving aggregates ------------------
  // Frame sums go through DECIMAL: DuckDB computes sliding sums with a
  // segment tree (different fp order than Spark's running fold).
  def q17(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, d)
      .filter($"o_custkey" < 100)
      .select($"o_custkey", $"o_orderkey",
        sum($"o_totalprice".cast("decimal(18,4)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_spend"),
        sum($"o_totalprice".cast("decimal(18,4)"))
          .over(w.rowsBetween(-2, 0))
          .cast("double").as("moving3_spend"),
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .as("order_seq"))
      .orderBy($"o_custkey", $"o_orderkey")
  }
  val q17Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving3_spend,
      |  COUNT(*) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // --- q18: ranking functions --------------------------------------------
  def q18(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.customer(s, d)
      .filter($"c_custkey" < 500)
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal",
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy($"c_mktsegment", $"rnk")
  }
  val q18Sql: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  RANK() OVER w AS rnk,
      |  DENSE_RANK() OVER w AS drnk,
      |  NTILE(4) OVER w AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume
      |FROM customer
      |WHERE c_custkey < 500
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, rnk""".stripMargin

  // --- q19: set operations — UNION / INTERSECT / EXCEPT ------------------
  def q19(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val building = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val machinery = c.filter($"c_mktsegment" === "MACHINERY").select($"c_custkey")
    val rich = c.filter($"c_acctbal" > 5000).select($"c_custkey")
    val inactive = q07Helper(s, d)
    building.union(machinery).distinct()
      .intersect(rich)
      .except(inactive)
      .orderBy($"c_custkey")
  }
  private def q07Helper(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
        .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey")
  }
  val q19Sql: String =
    """SELECT c_custkey FROM (
      |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |   UNION
      |   SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      |  INTERSECT
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |  EXCEPT
      |  SELECT c_custkey FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01'))
      |ORDER BY c_custkey""".stripMargin

  // --- q20: scalar string functions --------------------------------------
  def q20(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .filter($"p_partkey" < 300)
      .select($"p_partkey",
        upper($"p_name").as("name_upper"),
        lower($"p_brand").as("brand_lower"),
        substring($"p_name", 1, 4).as("name_prefix"),
        length($"p_name").as("name_len"),
        split($"p_name", " ").getItem(0).as("first_word"),
        regexp_extract($"p_name", "(\\w+)$", 1).as("last_word"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        regexp_replace($"p_name", "widget", "gadget").as("renamed"),
        reverse($"p_name").as("name_rev"),
        lpad($"p_brand", 12, "_").as("brand_pad"),
        trim(lit("  pad  ")).as("trimmed"))
      .orderBy($"p_partkey")
  }
  val q20Sql: String =
    """SELECT p_partkey,
      |  UPPER(p_name) AS name_upper,
      |  LOWER(p_brand) AS brand_lower,
      |  SUBSTRING(p_name, 1, 4) AS name_prefix,
      |  LENGTH(p_name) AS name_len,
      |  string_split(p_name, ' ')[1] AS first_word,
      |  regexp_extract(p_name, '(\w+)$', 1) AS last_word,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  regexp_replace(p_name, 'widget', 'gadget', 'g') AS renamed,
      |  reverse(p_name) AS name_rev,
      |  lpad(p_brand, 12, '_') AS brand_pad,
      |  trim('  pad  ') AS trimmed
      |FROM part
      |WHERE p_partkey < 300
      |ORDER BY p_partkey""".stripMargin

  // --- q21: date/time functions ------------------------------------------
  // Timestamps are emitted as formatted strings: deterministic across the
  // Spark(UTC-instant)/DuckDB(naive) parquet representations.
  def q21(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .filter($"o_orderkey" < 500)
      .select($"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        quarter($"o_orderdate").as("qtr"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("month_start"),
        datediff(lit("2000-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_y2k"),
        date_format($"o_orderdate" + expr("INTERVAL 90 DAYS"), "yyyy-MM-dd HH:mm:ss").as("due_date"),
        unix_timestamp($"o_orderdate").as("epoch_s"))
      .orderBy($"o_orderkey")
  }
  val q21Sql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
      |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k,
      |  strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d %H:%M:%S') AS due_date,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders
      |WHERE o_orderkey < 500
      |ORDER BY o_orderkey""".stripMargin

  // --- q22: conditional expressions --------------------------------------
  def q22(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey",
        when($"o_totalprice" > 300000, "high")
          .when($"o_totalprice" > 100000, "mid")
          .otherwise("low").as("tier"),
        nullif($"o_orderstatus", lit("O")).as("closed_status"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("status_label"),
        greatest($"o_totalprice", lit(50000.0)).as("floor_price"),
        least($"o_totalprice", lit(400000.0)).as("cap_price"))
      .groupBy($"tier", $"status_label")
      .agg(count(lit(1)).as("n"),
        dsum4($"floor_price").as("sum_floor"),
        dsum4($"cap_price").as("sum_cap"))
      .orderBy($"tier", $"status_label")
  }
  val q22Sql: String =
    """SELECT tier, status_label, COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(floor_price AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_floor,
      |  ROUND(CAST(SUM(CAST(cap_price AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_cap
      |FROM (
      |  SELECT o_orderkey,
      |    CASE WHEN o_totalprice > 300000 THEN 'high'
      |         WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS tier,
      |    COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
      |    GREATEST(o_totalprice, 50000.0) AS floor_price,
      |    LEAST(o_totalprice, 400000.0) AS cap_price
      |  FROM orders)
      |GROUP BY tier, status_label
      |ORDER BY tier, status_label""".stripMargin

  // --- q23: global sort + limit (top-N) ----------------------------------
  // Spark executes orderBy+limit as TakeOrderedAndProject — no full sort at
  // scale, each partition keeps N rows then the driver merges.
  def q23(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_quantity")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .limit(100)
  }
  val q23Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 100""".stripMargin

  /** name → (query fn, oracle SQL). */
  def pack: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q01_pricing_summary", q01 _, Some(q01Sql)),
    ("q02_filter_scan", q02 _, Some(q02Sql)),
    ("q03_shipping_priority", q03 _, Some(q03Sql)),
    ("q04_semi_join", q04 _, Some(q04Sql)),
    ("q05_region_revenue", q05 _, Some(q05Sql)),
    ("q06_selective_agg", q06 _, Some(q06Sql)),
    ("q07_anti_join", q07 _, Some(q07Sql)),
    ("q08_left_join_agg", q08 _, Some(q08Sql)),
    ("q09_full_outer", q09 _, Some(q09Sql)),
    ("q10_theta_join", q10 _, Some(q10Sql)),
    ("q11_returned_revenue", q11 _, Some(q11Sql)),
    ("q12_rollup", q12 _, Some(q12Sql)),
    ("q13_cube", q13 _, Some(q13Sql)),
    ("q14_count_distinct", q14 _, Some(q14Sql)),
    ("q15_topk_per_group", q15 _, Some(q15Sql)),
    ("q16_lag_lead", q16 _, Some(q16Sql)),
    ("q17_window_frames", q17 _, Some(q17Sql)),
    ("q18_ranking", q18 _, Some(q18Sql)),
    ("q19_set_ops", q19 _, Some(q19Sql)),
    ("q20_string_funcs", q20 _, Some(q20Sql)),
    ("q21_datetime_funcs", q21 _, Some(q21Sql)),
    ("q22_conditional", q22 _, Some(q22Sql)),
    ("q23_top_n", q23 _, Some(q23Sql)))
}
