package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for web-scraped training text.
  *
  * Patterns are deliberately RE2-safe (no lookaround, no backreferences) so
  * the identical pattern text runs in Java regex (Spark codegen) and RE2
  * (the DuckDB oracle, and most scanner sidecars) with the same matches.
  * Everything is a scalar expression pipeline — whole-stage codegen, no
  * UDFs, embarrassingly parallel at any corpus size.
  */
object Pii {

  /** Lowercase email addresses (the corpus normalizer lowercases first). */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Dotted-quad IPv4 literals. */
  val ipPattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redact emails then IPs with typed placeholder tokens. */
  def redact(c: Column): Column =
    regexp_replace(regexp_replace(c, emailPattern, "<EMAIL>"), ipPattern, "<IP>")

  def emailCount(c: Column): Column = regexp_count(c, lit(emailPattern))

  def ipCount(c: Column): Column = regexp_count(c, lit(ipPattern))
}
