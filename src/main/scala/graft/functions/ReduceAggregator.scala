package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.reflect.runtime.universe.TypeTag

/** Presto `reduce_agg(input, initial, input_fn, combine_fn)` — the
  * generic user-defined reduction aggregate — re-expressed as a typed
  * Spark `Aggregator` factory: the caller supplies the initial state, the
  * row-fold, and the partial-merge, and gets a first-class aggregate
  * Column usable in any `groupBy`.
  *
  * The two-function contract maps exactly onto Spark's partial+final
  * aggregation: `inputFn` runs map-side per row, `combineFn` merges
  * partial states across partitions/shuffle — so a reduction is only
  * correct (here AND in Presto) if `combineFn` is associative +
  * commutative and `init` is its identity. That algebra is the caller's
  * obligation; RepartitionInvariance is property-tested in EdgeCaseSpec.
  *
  * Scale note: state is O(1) per group by construction, partials combine
  * map-side, nothing about the reduction is driver-side — the same reasons
  * Presto restricts reduce_agg state to scalar-ish types.
  */
object ReduceAggregator {

  def aggregator[T, S](init: S, inputFn: (S, T) => S, combineFn: (S, S) => S)(
      implicit sEnc: Encoder[S]): Aggregator[T, S, S] =
    new Aggregator[T, S, S] {
      def zero: S = init
      def reduce(b: S, x: T): S = inputFn(b, x)
      def merge(x: S, y: S): S = combineFn(x, y)
      def finish(s: S): S = s
      def bufferEncoder: Encoder[S] = sEnc
      def outputEncoder: Encoder[S] = sEnc
    }

  /** Column form: `reduceAgg(init)(inputFn)(combineFn)(column)`. */
  def reduceAgg[T: TypeTag, S](init: S)(inputFn: (S, T) => S)(combineFn: (S, S) => S)(
      c: Column)(implicit sEnc: Encoder[S]): Column =
    udaf(aggregator(init, inputFn, combineFn)).apply(c)
}
