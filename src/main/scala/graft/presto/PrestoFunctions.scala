package graft.presto

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Presto/Trino-named function facade (public SQL surface, per published
  * Trino docs — SURVEY §2.7 [P]): a user of the reference engine can keep
  * their function vocabulary and get the Spark-native implementation.
  * Everything delegates to codegen'd built-ins — no UDFs.
  */
object PrestoFunctions {

  // ---- string ----------------------------------------------------------
  /** Presto strpos(string, substring) — 1-based, 0 if absent. */
  def strpos(str: Column, sub: String): Column = locate(sub, str).cast("long")
  /** Presto cardinality(array|map). */
  def cardinality(c: Column): Column = size(c).cast("long")
  /** Presto array_join(array, delim). */
  def array_join(arr: Column, delim: String): Column = concat_ws(delim, arr)
  /** Presto split(string, delim) — literal delimiter, not regex. */
  def split_literal(str: Column, delim: String): Column =
    split(str, java.util.regex.Pattern.quote(delim))
  /** Presto codepoint(string). */
  def codepoint(c: Column): Column = ascii(c)
  /** Presto chr(codepoint). */
  def chr(c: Column): Column = char(c)
  /** Presto from_utf8 / to_utf8. */
  def to_utf8(c: Column): Column = c.cast("binary")
  def from_utf8(c: Column): Column = c.cast("string")

  // ---- datetime --------------------------------------------------------
  /** Presto date_diff(unit, start, end). */
  def date_diff(unit: String, start: Column, end: Column): Column =
    unit.toLowerCase match {
      case "day"    => datediff(end.cast("date"), start.cast("date")).cast("long")
      case "hour"   => ((end.cast("long") - start.cast("long")) / 3600L).cast("long")
      case "minute" => ((end.cast("long") - start.cast("long")) / 60L).cast("long")
      case "second" => (end.cast("long") - start.cast("long"))
      case "month"  => months_between(end, start).cast("long")
      case "year"   => (year(end) - year(start)).cast("long")
      case u => throw new IllegalArgumentException(s"unsupported unit $u")
    }
  /** Presto date_add(unit, value, ts). */
  def date_add(unit: String, value: Int, ts: Column): Column =
    ts + expr(s"INTERVAL $value ${unit.toUpperCase}")
  /** Presto from_unixtime / to_unixtime. */
  def from_unixtime_(epoch: Column): Column = timestamp_seconds(epoch)
  def to_unixtime(ts: Column): Column = unix_timestamp(ts).cast("double")

  // ---- aggregate names -------------------------------------------------
  /** Presto approx_distinct(col). */
  def approx_distinct(c: Column): Column = approx_count_distinct(c)
  /** Presto approx_percentile(col, p). */
  def approx_percentile_(c: Column, p: Double): Column =
    percentile_approx(c, lit(p), lit(10000))
  /** Presto arbitrary(col) — any value; Spark: first (non-deterministic). */
  def arbitrary(c: Column): Column = first(c, ignoreNulls = true)
  /** Presto array_agg(col). */
  def array_agg(c: Column): Column = collect_list(c)
  /** Presto bool_and / bool_or. */
  def bool_and_(c: Column): Column = min(c)
  def bool_or_(c: Column): Column = max(c)

  // ---- array / map -----------------------------------------------------
  /** Presto element_at — null on out-of-bounds (Spark ANSI throws). */
  def element_at_safe(c: Column, i: Int): Column = try_element_at(c, lit(i))
  /** Presto contains(array, elem). */
  def contains(arr: Column, elem: Column): Column = array_contains(arr, elem)
  /** Presto slice(array, start, length). */
  def slice_(arr: Column, start: Int, length: Int): Column = slice(arr, start, length)
  /** Presto map_keys / map_values already share names with Spark. */

  // ---- json ------------------------------------------------------------
  /** Presto json_extract_scalar(json, path). */
  def json_extract_scalar(json: Column, path: String): Column =
    get_json_object(json, path)

  // ---- conditional -----------------------------------------------------
  /** Presto if(cond, t, f). */
  def if_(cond: Column, t: Column, f: Column): Column = when(cond, t).otherwise(f)
}
