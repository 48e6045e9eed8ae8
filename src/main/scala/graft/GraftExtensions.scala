package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.{BigramCounts, BpePriorityEncode, HyperplaneBucket, JaccardHashSets, JaccardSets, JaroWinkler, LangMarkerHits, LshBandBuckets, NfcNormalize, NgramHashSet, NgramSet, RepetitionStats, RollingFingerprint, SimHash64, VectorDotScaled}

/** SparkSessionExtensions entry point: makes the engine's custom
  * Catalyst pieces available to any session, including pure-SQL users:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *
  *   spark.sql("SELECT vector_dot_scaled(a.embedding, b.embedding) ...")
  *
  * Kept deliberately small (SURVEY.md §4.1): the declared surface needs
  * zero custom rules or strategies — Catalyst's existing optimizer
  * covers it — so the only injection is the codegen'd similarity kernel.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorDotScaled.registration)
    ext.injectFunction(SimHash64.registration)
    ext.injectFunction(NgramSet.registration)
    ext.injectFunction(NgramHashSet.registration)
    ext.injectFunction(JaccardSets.registration)
    ext.injectFunction(JaccardHashSets.registration)
    ext.injectFunction(LshBandBuckets.registration)
    ext.injectFunction(HyperplaneBucket.registration)
    ext.injectFunction(LangMarkerHits.registration)
    ext.injectFunction(RollingFingerprint.registration)
    ext.injectFunction(RepetitionStats.registration)
    ext.injectFunction(NfcNormalize.registration)
    ext.injectFunction(BigramCounts.registration)
    ext.injectFunction(JaroWinkler.registration)
    ext.injectFunction(BpePriorityEncode.registration)
  }
}
