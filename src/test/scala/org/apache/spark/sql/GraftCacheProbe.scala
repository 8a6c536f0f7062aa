package org.apache.spark.sql

/** Test-only bridge into `private[sql]` state: whether the session's
  * CacheManager holds any cached Dataset. Lives in the Spark package to
  * satisfy the access qualifier; used only by CacheHygieneSpec to assert
  * the library's query-scoped persist contract.
  */
object GraftCacheProbe {
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
