package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Observation

/** `Observation.getOrEmpty` is `private[sql]` in Spark 4, but a NON-blocking
  * read is exactly what an operational counter needs (`Observation.get`
  * blocks until the observed query finishes an action — deadlock if a
  * registered frame was never executed). Same pattern as [[ColumnBridge]]. */
object ObservationBridge {
  /** The observed metrics row as a map, or empty if no action completed. */
  def getOrEmpty(obs: Observation): Map[String, Any] = obs.getOrEmpty
}
