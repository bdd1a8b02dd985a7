package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("as-of join equals the window-based q29 lookup on real events") {
    import spark.implicits._
    val ev = Tables.events(spark, sf).withColumn("epoch_s", expr("ts div 1000000000"))
    val purchases = ev.filter($"event_type" === "purchase")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"epoch_s".as("signup_epoch"))
    val joined = AsOfJoin(purchases, signups, Seq("user_id"), "ts", "ts",
      Seq("signup_epoch"))
      .select($"event_id",
        date_format(timestamp_seconds($"signup_epoch"), "yyyy-MM-dd HH:mm:ss")
          .as("last_signup_time"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    val expected = queries.Events.q29(spark, sf)
      .select($"event_id", $"last_signup_time")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    assert(joined == expected)
  }

  test("tolerance nulls out stale matches") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 500L)).toDF("k", "t")
    val right = Seq((1L, 90L, "a"), (1L, 200L, "b")).toDF("k", "t", "v")
      .select($"k", $"t", $"v".as("payload"))
    val out = AsOfJoin(left, right, Seq("k"), "t", "t", Seq("payload"),
      tolerance = Some(lit(50L)))
      .orderBy($"t").collect()
    assert(Option(out(0).getString(2)).contains("a"))   // 100-90=10 <= 50
    assert(out(1).isNullAt(2), "500-200=300 > 50 must be nulled")
  }
}
