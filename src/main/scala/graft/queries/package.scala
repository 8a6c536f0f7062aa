package graft

import org.apache.spark.sql.DataFrame

/** Package-level helpers in scope for every query pack. */
package object queries {

  /** Alias of the engine-level registry (moved in r9) so
    * `graft.queries.Persisted` keeps resolving for mains and specs.
    */
  val Persisted: graft.engine.Persisted.type = graft.engine.Persisted

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
