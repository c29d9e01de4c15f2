package graft

import graft.functions.ArrayCosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point — the production path for wiring
  * this engine's native expressions into any session:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (Queries also self-register at runtime via
  * ArrayCosineSimilarity.register since the driver harness builds its
  * session without configs.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(ArrayCosineSimilarity.descriptor)
    ext.injectFunction(graft.functions.NormalizeNfc.descriptor)
    ext.injectFunction(graft.functions.JaroWinkler.descriptor)
    ext.injectFunction(graft.functions.LshSignature.descriptor)
    graft.functions.LakeScanTvf.all.foreach(ext.injectTableFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.CosineJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
