package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

/** Declarative quality-rule configuration — the engine's reading of the
  * reference's Soda check set (/root/reference/include/soda/checks.yml:1-9):
  *
  * {{{
  * checks for crypto_prices:
  *   - min(price_usd):
  *       fail: when < 0
  *   - freshness(extracted_at):
  *       warn: when > 2h
  *       fail: when > 6h
  * }}}
  *
  * A minimal line-oriented parser for exactly this dialect (metric(column)
  * headers with warn/fail threshold lines) — no YAML dependency, and the
  * parsed spec drives [[QualityGate]] so the declarative rules and the
  * engine gate cannot drift apart.
  */
object QualityConfig {

  final case class FreshnessRule(tsCol: String, warnHours: Long, failHours: Long)
  final case class MinRule(valueCol: String, failBelow: Double)
  final case class CheckSet(table: String, minRule: Option[MinRule],
      freshness: Option[FreshnessRule])

  private val tableRe = """checks for\s+(\w+):""".r
  private val minRe = """-\s*min\((\w+)\):""".r
  private val freshRe = """-\s*freshness\((\w+)\):""".r
  private val failBelowRe = """fail:\s*when\s*<\s*(-?[\d.]+)""".r
  private val warnAboveRe = """warn:\s*when\s*>\s*(\d+)h""".r
  private val failAboveRe = """fail:\s*when\s*>\s*(\d+)h""".r

  def parse(text: String): CheckSet = {
    var table = ""
    var minCol: Option[String] = None
    var freshCol: Option[String] = None
    var failBelow: Option[Double] = None
    var warnHours: Option[Long] = None
    var failHours: Option[Long] = None
    var section: String = ""
    text.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .foreach {
        case tableRe(t) => table = t
        case minRe(c) => minCol = Some(c); section = "min"
        case freshRe(c) => freshCol = Some(c); section = "freshness"
        case failBelowRe(v) if section == "min" => failBelow = Some(v.toDouble)
        case warnAboveRe(h) if section == "freshness" => warnHours = Some(h.toLong)
        case failAboveRe(h) if section == "freshness" => failHours = Some(h.toLong)
        case other =>
          throw new IllegalArgumentException(s"unrecognized check line: '$other'")
      }
    require(table.nonEmpty, "missing 'checks for <table>:' header")
    CheckSet(table,
      for (c <- minCol; v <- failBelow) yield MinRule(c, v),
      for (c <- freshCol; w <- warnHours; f <- failHours)
        yield FreshnessRule(c, w, f))
  }

  /** Evaluate a parsed check set with the severity semantics of
    * [[QualityGate.evaluate]] (fail trumps warn; min-rule violation and
    * duplicate keys are failures). */
  def evaluate(df: DataFrame, spec: CheckSet, now: Timestamp,
      keys: Seq[String] = Schemas.priceKeys): QualityGate.GateResult = {
    val valueCol = spec.minRule.map(_.valueCol).getOrElse("price_usd")
    val tsCol = spec.freshness.map(_.tsCol).getOrElse("extracted_at")
    QualityGate.evaluate(df, now, valueCol, tsCol, keys,
      spec.freshness.map(_.warnHours).getOrElse(Long.MaxValue),
      spec.freshness.map(_.failHours).getOrElse(Long.MaxValue),
      spec.minRule.map(_.failBelow).getOrElse(Double.NegativeInfinity))
  }
}
