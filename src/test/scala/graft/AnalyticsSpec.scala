package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct lands within its rsd bound of the exact count") {
    // numeric error bound on the raw aggregates (q63's hashed output only
    // carries the within-bound flag, which must be uniformly true)
    import org.apache.spark.sql.functions._
    val raw = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"approx $approx vs exact $exact for ${r.getString(0)}")
    }
    val flags = queries.Analytics.q63(spark, sf).collect()
    assert(flags.nonEmpty && flags.forall(_.getBoolean(2)),
      "q63 within-bound flag must be true for every group")
  }

  test("count-min sketch never underestimates: every token, not just top-k") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    val sf = "/root/testdata/sf0.001"
    val D = 4
    val W = 8192L
    def bucket(row: Int, tok: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit(row.toString), lit("|"), tok)), 1, 14), 16, 10)
        .cast("long") % W
    val toks = Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("tok")).persist()
    val cms = toks
      .select(explode(array((0 until D).map(i =>
        struct(lit(i).as("r"), bucket(i, col("tok")).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
    val est = exact
      .select(col("tok"), col("exact_n"),
        explode(array((0 until D).map(i =>
          struct(lit(i).as("r"), bucket(i, col("tok")).as("b"))): _*)).as("rb"))
      .join(cms, col("rb.r") === cms("r") && col("rb.b") === cms("b"))
      .groupBy(col("tok"), col("exact_n"))
      .agg(min(col("c")).as("cms_est"))
    val under = est.filter(col("cms_est") < col("exact_n")).count()
    assert(under == 0, s"CMS underestimated $under tokens")
  }

  test("SQL-text entry point answers ad-hoc queries over registered views") {
    val df = queries.Analytics.q61(spark, sf)
    assert(df.count() > 0)
    // and arbitrary follow-up SQL works against the same catalog state
    val n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").head().getLong(0)
    assert(n > 0)
  }

  test("crypto trend series: 4 coins x 72 hours, deltas sum to net move") {
    val rows = queries.Analytics.q62(spark, sf).collect()
    assert(rows.length == 288)
    val perCoin = rows.groupBy(_.getString(0))
    assert(perCoin.keySet == Set("bitcoin", "ethereum", "solana", "tether"))
    perCoin.foreach { case (_, rs) =>
      assert(rs.head.isNullAt(3), "first hour has no previous-hour delta")
      val deltas = rs.drop(1).map(_.getDouble(3)).sum
      val net = rs.last.getDouble(2) - rs.head.getDouble(2)
      assert(math.abs(deltas - net) < 1e-9)
    }
  }

  test("last-touch attribution matches a driver-side per-user replay") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("q114_last_touch")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000, r.getLong(2), r.getString(3)))
    val expect = scala.collection.mutable.Map[String, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    events.groupBy(_._1).values.foreach { evs =>
      var lastTouch: Option[(Long, String)] = None
      evs.sortBy(e => (e._2, e._3)).foreach { case (_, tsUs, _, typ) =>
        if (typ == "purchase") {
          val (touch, delay) = lastTouch match {
            case Some((tus, tt)) => (tt, tsUs - tus)
            case None => ("none", 0L)
          }
          val (n, s0) = expect(touch)
          expect(touch) = (n + 1, s0 + delay)
        }
        if (typ == "view" || typ == "click") lastTouch = Some((tsUs, typ))
      }
    }
    assert(got.keySet == expect.keySet)
    got.foreach { case (touch, (n, sumDelay)) =>
      val (en, es) = expect(touch)
      assert(n == en, s"$touch: $n purchases, expected $en")
      if (touch != "none")
        assert(sumDelay.contains(es), s"$touch: delay ${sumDelay} != $es")
      else assert(sumDelay.isEmpty, "'none' bucket must have null delay sum")
    }
  }
}
