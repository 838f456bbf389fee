package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, composed from
  * Spark higher-order functions (codegen-adjacent, no UDF serialization).
  *
  * Determinism: dot products accumulate left-to-right (sequential
  * `aggregate`), so results are bit-stable within Spark across partitions
  * and runs. Cross-engine float comparisons are still avoided in declared
  * queries — kNN outputs ranks, not raw similarities.
  *
  * Scale note: these are per-row expressions — they pipeline inside the
  * stage that carries the vectors; no shuffle, no driver collection.
  */
object VectorFunctions {

  /** Elementwise product sum (double accumulation, sequential). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** L2 distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Unit-normalize a float vector (returns array<double>). */
  def normalize(a: Column): Column =
    transform(a, x => x.cast("double") / norm2(a))
}
