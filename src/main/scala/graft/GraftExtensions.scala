package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point — wire with
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * Injects the engine's native Catalyst functions into every session's
  * FunctionRegistry (the extensions path of SURVEY.md §2.11; per-session
  * programmatic registration is also available via
  * [[graft.functions.WordNgrams.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((functions.WordNgrams.identifier,
      functions.WordNgrams.info, functions.WordNgrams.builder))
    ext.injectFunction((functions.WinnowFingerprints.identifier,
      functions.WinnowFingerprints.info, functions.WinnowFingerprints.builder))
    ext.injectFunction((functions.LongDot.identifier,
      functions.LongDot.info, functions.LongDot.builder))
    ext.injectFunction((functions.LongSsd.identifier,
      functions.LongSsd.info, functions.LongSsd.builder))
    ext.injectFunction((functions.SortedIntersectCount.identifier,
      functions.SortedIntersectCount.info, functions.SortedIntersectCount.builder))
    ext.injectFunction((functions.InterleaveBits.identifier,
      functions.InterleaveBits.info, functions.InterleaveBits.builder))
    ext.injectFunction((functions.CharEntropy.identifier,
      functions.CharEntropy.info, functions.CharEntropy.builder))
    ext.injectFunction((functions.CdcChunks.identifier,
      functions.CdcChunks.info, functions.CdcChunks.builder))
    ext.injectPlannerStrategy(_ => plans.TopKStrategy)
    ext.injectPlannerStrategy(_ => plans.AsOfStrategy)
    ext.injectOptimizerRule(_ => plans.RankFilterToTopK)
  }
}
