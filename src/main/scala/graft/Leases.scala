package graft

/** Per-lane release-handle parking lot.
  *
  * The `*Releasable` operators (GraphOps, DedupOps, …) return their
  * result plus a handle that frees the FINAL localCheckpoint backing
  * it. A lane lambda (`SparkEntry.queries`) cannot call that handle
  * itself — the driver consumes the returned frame AFTER the lambda
  * returns, and a freed localCheckpoint is unrecomputable (lineage is
  * truncated by design). Without any release, every bench/verify
  * invocation of such a lane leaks one checkpoint for the session
  * (warmup + 3 passes × 7 graph-family lanes ≈ 24 dead checkpoint sets
  * competing with execution memory — the measured 5.8 % co-run tax of
  * round 9).
  *
  * The fix is deferred-by-one: each invocation parks its handle under
  * the lane's key and frees whatever the PREVIOUS invocation parked —
  * by then the previous frame has long been consumed. Steady-state
  * storage is O(1 checkpoint per lane) instead of O(invocations), and
  * bench timing stays honest: every invocation still recomputes from
  * scratch (nothing is reused across passes, unlike caching the lane
  * output would).
  */
object Leases {

  private val held =
    scala.collection.concurrent.TrieMap.empty[String, () => Unit]

  /** Free the handle parked under `key` by the previous invocation (if
    * any) and park `rel` in its place. Returns `out` so a lane lambda
    * can end with `Leases.swap(name, rel)(out)`.
    */
  def swap[A](key: String, rel: () => Unit)(out: A): A = {
    held.put(key, rel).foreach(prev => prev())
    out
  }

  /** Free and forget the handle parked under `key`, if any. */
  def release(key: String): Unit = held.remove(key).foreach(_())

  /** Free every parked handle (end-of-run hygiene). */
  def releaseAll(): Unit = held.keys.foreach(release)
}
