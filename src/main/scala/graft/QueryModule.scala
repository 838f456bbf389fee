package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

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
  *
  * Representation (r9): BIGINT "micros", not DECIMAL. The first noop-write
  * bench exposed the DECIMAL(30,6) buffer as the aggregate families' top
  * cost — precision > 18 forces the BigDecimal-backed buffer and the whole
  * sum runs ~6× slower than a primitive long sum (measured 2.0 s vs 0.32 s
  * for Q1's four sums at sf0.1). `floor(x·1e6 + 0.5)` quantizes exactly
  * like the scale-6 HALF_UP cast on every value the contract above admits
  * (≤ 6 carried decimal digits ⇒ x·1e6 sits ~0.5 away from the nearest
  * tie), and BOTH engines compute it over the same IEEE product — the
  * mirror is the same op sequence, never an abstract rounding rule (the
  * sc21 parity contract). The long sum stays inside whole-stage codegen;
  * under ANSI arithmetic a 100 TB-scale overflow throws LOUDLY (the
  * production form is a two-level sum: partial micros → DECIMAL rollup).
  * The final (exact long) → double → /1e6 division is correctly rounded
  * of the same rational the decimal path produced, so outputs are
  * bit-identical to the r8 form on contract-conforming data.
  */
object Det {
  /** Order-independent sum of a double column; returns double. */
  def dsum(c: Column): Column =
    (sum(floor(c * lit(1e6) + lit(0.5)).cast(LongType)).cast(DoubleType)
      / lit(1e6)).cast(DoubleType)

  /** Order-independent mean: exact-micros sum / count. */
  def davg(c: Column): Column =
    (dsum(c) / count(c)).cast(DoubleType)

  /** Oracle-side equivalents (DuckDB SQL fragments — the SAME floor/
    * multiply/divide op sequence over the same doubles). */
  def dsumSql(expr: String): String =
    s"(CAST(SUM(CAST(floor(($expr) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)" +
      s" / 1e6)"
  def davgSql(expr: String): String =
    s"((CAST(SUM(CAST(floor(($expr) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)" +
      s" / 1e6) / COUNT($expr))"
}
