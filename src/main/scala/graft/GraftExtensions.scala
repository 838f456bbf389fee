package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.GraftFunctions

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available in ANY session (including spark-sql / thrift)
  * via `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * Sessions built without the conf can call
  * `CosineSimilarityExpression.register(spark)` imperatively — the
  * declared queries do that themselves, so the harness sessions need no
  * special configuration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinFilterPushdown)
  }
}
