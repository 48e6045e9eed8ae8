package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Test/diagnostic access to the session's listener bus: cache-hygiene
  * assertions need "every queued QueryExecutionListener callback has
  * run" before inspecting `sc.getPersistentRDDs` (the release listener
  * in [[graft.operators.CacheLifecycle]] fires asynchronously on the
  * bus thread). `listenerBus` is `private[spark]`, hence this shim in
  * the org.apache.spark namespace.
  */
object ListenerBus {
  def flush(spark: SparkSession, timeoutMillis: Long = 30000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)
}
