package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the extended relational pack (queries.Extended): semantics the
  * oracle can't see — built-in agreement for the closed-form statistics,
  * pivot/unpivot inversion, and sample-rate sanity. */
class ExtendedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("closed-form corr/covar agree with Spark built-ins to 1e-6") {
    val manual = queries.Extended.q74(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(covar_samp(col("l_quantity"), col("l_extendedprice")).as("cs"),
        covar_pop(col("l_quantity"), col("l_extendedprice")).as("cp"),
        corr(col("l_quantity"), col("l_extendedprice")).as("r"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(manual.keySet == builtin.keySet)
    manual.foreach { case (k, (cs, cp, r)) =>
      val (bcs, bcp, br) = builtin(k)
      assert(math.abs(cs - bcs) / math.max(1.0, math.abs(bcs)) < 1e-6, s"covar_samp $k")
      assert(math.abs(cp - bcp) / math.max(1.0, math.abs(bcp)) < 1e-6, s"covar_pop $k")
      assert(math.abs(r - br) < 1e-6, s"corr $k: $r vs $br")
    }
  }

  test("pivot row counts re-sum to the plain groupBy counts") {
    val pivoted = queries.Extended.q72(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1) + r.getLong(3) + r.getLong(5))).toMap
    val plain = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pivoted == plain)
  }

  test("unpivot totals match direct column sums") {
    val melted = queries.Extended.q73(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val direct = Tables.part(spark, sf)
      .agg(sum(col("p_size").cast("decimal(18,2)")).cast("double"),
        sum(col("p_retailprice").cast("decimal(18,2)")).cast("double"))
      .head()
    assert(melted("p_size") == direct.getDouble(0))
    assert(melted("p_retailprice") == direct.getDouble(1))
  }

  test("hash sample keeps roughly 1/16 of rows and is reproducible") {
    val total = Tables.orders(spark, sf).count().toDouble
    val a = queries.Extended.q76(spark, sf).agg(sum(col("n_sampled"))).head().getLong(0)
    val b = queries.Extended.q76(spark, sf).agg(sum(col("n_sampled"))).head().getLong(0)
    assert(a == b, "deterministic sample must be reproducible")
    val rate = a / total
    assert(rate > 0.02 && rate < 0.15, s"sample rate $rate far from 1/16")
  }

  test("histogram buckets partition all orders exactly once") {
    val histo = queries.Extended.q75(spark, sf)
      .agg(sum(col("n_orders"))).head().getLong(0)
    assert(histo == Tables.orders(spark, sf).count())
  }

  test("bloom semi join equals the plain semi join and actually prunes") {
    val large = Tables.lineitem(spark, sf)
    val hot = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000.0)
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val bloomed = operators.BloomPrune.bloomSemiJoin(large, hot, "l_orderkey", 10000L)
    val plain = large.join(hot.select(col("l_orderkey")).distinct(),
      Seq("l_orderkey"), "left_semi")
    assert(bloomed.count() == plain.count())
    // the pre-filter itself must pass ~selectivity + fpp of rows, not all
    val pruned = operators.BloomPrune.bloomPruned(large, hot, "l_orderkey", 10000L)
    val kept = pruned.count().toDouble
    assert(kept < large.count() * 0.5,
      s"bloom kept $kept of ${large.count()} rows — not pruning")
    // the probe must be the codegen might_contain expression, not a ScalaUDF
    val phys = pruned.queryExecution.executedPlan.toString
    assert(phys.contains("might_contain"), s"no might_contain in plan:\n$phys")
    assert(!phys.contains("UDF"), s"ScalaUDF leaked into the bloom probe:\n$phys")
  }

  test("sorted-array top3 unpacks descending and top1 is the group max") {
    val rows = queries.Extended.q78(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t1, t2, t3) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(t1 >= t2 && t2 >= t3, s"${r.getString(0)}: not descending")
    }
    val maxes = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(max(col("o_totalprice").cast("decimal(14,2)")).cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getDouble(1) == maxes(r.getString(0))))
  }

  test("range-band join only emits lags within [0, 60] days") {
    val bands = queries.Extended.q77(spark, sf).collect().map(_.getLong(0))
    assert(bands.nonEmpty && bands.forall(b => b >= 0 && b <= 4))
  }
}
