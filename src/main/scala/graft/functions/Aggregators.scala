package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregates — the engine's UDAF extension point (SURVEY.md
  * §2 Tier B "UDF surface"). Prefer built-ins; an Aggregator is the
  * idiomatic escape hatch when none fits: typed buffer, merge-based
  * (partial aggregation on the map side for free), registrable for SQL.
  */
object Aggregators {

  /** Weighted arithmetic mean: sum(v*w)/sum(w); null-safe empty → NaN. */
  case class WBuf(var vsum: Double, var wsum: Double)

  object WeightedMean extends Aggregator[(Double, Double), WBuf, Double] {
    override def zero: WBuf = WBuf(0.0, 0.0)
    override def reduce(b: WBuf, in: (Double, Double)): WBuf = {
      b.vsum += in._1 * in._2; b.wsum += in._2; b
    }
    override def merge(a: WBuf, b: WBuf): WBuf = {
      a.vsum += b.vsum; a.wsum += b.wsum; a
    }
    override def finish(b: WBuf): Double = b.vsum / b.wsum
    override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register SQL-callable forms, so the BiServe SQL-text surface can use
    * the engine's sketches too:
    *  - weighted_mean(value, weight)
    *  - kll_sketch(value) → mergeable quantile-sketch struct
    *    (values, weights, err, n); kll_merge(values, weights, err, n)
    *    re-aggregates stored sketch columns to coarser rollup levels
    *  - kmv_sketch(hash64) → k-minimum-values distinct sketch (mins)
    * Sketch parameters match the query conventions (k=64 both). */
  def register(spark: SparkSession): Unit = {
    implicit val tupleEnc: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    spark.udf.register("weighted_mean", udaf(WeightedMean))
    spark.udf.register("kll_sketch",
      udaf(new graft.operators.QuantileSketch.SketchAgg(64), Encoders.scalaDouble))
    spark.udf.register("kll_merge",
      udaf(new graft.operators.QuantileSketch.MergeAgg(64),
        Encoders.product[graft.operators.QuantileSketch.Sketch]))
    spark.udf.register("kmv_sketch",
      udaf(new graft.operators.KmvSketch.Agg(64), Encoders.scalaLong))
  }
}
