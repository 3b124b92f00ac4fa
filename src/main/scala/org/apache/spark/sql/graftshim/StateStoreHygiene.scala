package org.apache.spark.sql.graftshim

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Access shim: `StateStore.unloadAll()` is `private[sql]`, but it is
  * exactly the between-drains hygiene the parity harness needs — a
  * drained `AvailableNow` query leaves its state-store providers loaded
  * in the executor map until the next maintenance sweep, which
  * compounds across many drains in one session (round-9 verdict #2).
  * This object lives under the `org.apache.spark.sql` namespace solely
  * to re-export that one call; no other internal surface is touched.
  */
object StateStoreHygiene {
  /** Unload every loaded state-store provider in this JVM (local mode:
    * the whole cluster). Safe between queries — providers reload
    * lazily on next use. */
  def unloadAllProviders(): Unit = StateStore.unloadAll()
}
