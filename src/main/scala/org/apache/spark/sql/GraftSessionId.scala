package org.apache.spark.sql

/** Bridge into `private[sql]` state: a stable unique id for a session.
  * `sessionUUID` is package-private to org.apache.spark.sql, so the
  * shared-cache tier (graft.engine.Persisted) reads it through this shim
  * — unlike `System.identityHashCode`, a UUID can never alias a different
  * live session, which is what makes it a safe cache-map key.
  */
object GraftSessionId {
  def uuid(spark: SparkSession): String = spark match {
    case c: classic.SparkSession => c.sessionUUID
    case other => "idhash-" + System.identityHashCode(other).toHexString
  }
}
