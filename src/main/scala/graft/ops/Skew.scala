package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (SURVEY §4 / the 100 TB checklist).
  *
  * AQE's skew-join splitting handles most runtime skew; these helpers are
  * for the cases AQE can't fix: a groupBy where one key holds a large
  * fraction of all rows (the partial aggregate itself bottlenecks on one
  * task), or a shuffle join against a hot key set known in advance.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) first so the hot
    * key's rows spread over `salts` tasks, then re-aggregate by key.
    * Works for any commutative re-aggregable pair (partial, merge) —
    * here: count and long-sum, the common pipeline meters.
    */
  def saltedCounts(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.groupBy(key.as("k"), pmod(monotonically_increasing_id(), lit(salts)).as("salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_n")).as("n"))

  /** Salted equi-join of a skewed fact against a small-ish dim: the fact
    * side gets a random salt in [0, salts); the dim side is exploded once
    * per salt value so every (key, salt) bucket finds its match. Use when
    * the dim is too big to broadcast but the fact's key distribution is
    * pathological.
    */
  def saltedJoin(fact: DataFrame, factKey: Column,
                 dim: DataFrame, dimKey: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim,
      factKey === dimKey && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
