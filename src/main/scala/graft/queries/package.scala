package graft

import org.apache.spark.sql.DataFrame

/** Package-level helpers in scope for every query pack. */
package object queries {

  /** `.persistScoped()` = `.persist()` + registration with [[Persisted]],
    * so the frame is released when the next declared query builds (see
    * the registry's Scaladoc for the library cache-hygiene contract).
    * Declared queries must use this instead of bare `.persist()` —
    * CacheHygieneSpec greps for violations.
    */
  implicit final class ScopedPersist(private val df: DataFrame) extends AnyVal {
    def persistScoped(): DataFrame = Persisted.add(df)
  }
}
