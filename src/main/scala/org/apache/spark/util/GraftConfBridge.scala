package org.apache.spark.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext

/**
 * Public seam over the `private[spark]` SerializableConfiguration —
 * the same necessity as `GraftColumnBridge` for the `private[sql]`
 * Column↔Expression conversions. Hadoop's Configuration is not
 * Serializable, so shipping the session's filesystem settings
 * (credentials, object-store endpoints) to executors requires Spark's
 * own wrapper; this is the one supported way to broadcast it.
 */
object GraftConfBridge {

  /** Broadcast `conf` and return a serializable thunk that yields it
    * on the executors. */
  def broadcastConf(sc: SparkContext, conf: Configuration): () => Configuration = {
    val bc = SerializableConfiguration.broadcast(sc, conf)
    () => bc.value.value
  }
}
