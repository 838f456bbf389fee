package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One group of declared operators. `queries` keys must match `oracleSql`
  * keys (queries without an oracle get the driver's weaker rows-only
  * check — reserved for approx/nondeterministic ops, SURVEY §2 A3/A7/O9/L2).
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]
}

/** Determinism helpers — the harness byte-hash-compares results against
  * DuckDB (SURVEY §5.4), so every double aggregate must be bit-identical
  * across engines and summation orders.
  *
  * Doubles summed in parallel are order-dependent (error ~ sqrt(n)·eps·|sum|
  * crosses 2-decimal rounding boundaries at sf0.1 magnitudes ~3e10), so we
  * sum in EXACT decimal then cast back to double: order-independent.
  *
  * Scale choice: the monetary columns carry 2 decimal digits, so products
  * like price·(1-disc)·(1+tax) carry EXACTLY 6 — casting the double at
  * scale 6 is therefore exact (nearest 6-dp decimal ≡ true product; double
  * error ~1e-11 « 5e-7 boundary distance) and never tie-breaks. Scale 4
  * was measurably wrong: exact …50-at-6dp ties are common (~0.7% of rows)
  * and Spark (HALF_UP on exact binary expansion) vs DuckDB (half-even on
  * the scaled double) break them differently. Keep derived expressions'
  * decimal digits ≤ 6 or raise the scale. The final decimal→double cast is
  * correctly rounded on both engines while the scaled sum < 2^53 (safe for
  * the sf0.01 correctness gate and sf0.1 by a wide margin).
  */
object Det {
  /** Order-independent sum of a double column; returns double. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(30, 6))).cast(DoubleType)

  /** Order-independent mean: exact-decimal sum / count. */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(30, 6))).cast(DoubleType) / count(c)).cast(DoubleType)

  /** Oracle-side equivalents (DuckDB SQL fragments). */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE)"
  def davgSql(expr: String): String =
    s"(CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE) / COUNT($expr))"
}
