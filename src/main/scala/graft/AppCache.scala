package graft

import org.apache.spark.sql.SparkSession

/** Process-wide memo for per-(application, input-dir) artifacts —
  * checkpointed pair tables, staged replay directories, ANN index paths.
  *
  * Keying on the [[SparkSession]] object itself pins the session (and any
  * `localCheckpoint`ed frames built from it) for the JVM lifetime once the
  * session stops — the leak the round-9 review flagged in `opqCache` /
  * `rebalancedIvfCache` / `stagedDsirDocs`. This memo instead keys on
  * `applicationId` and evicts entries of every OTHER application on
  * access: a stopped app's artifacts are dropped the first time the next
  * app touches the cache, so at most one application's artifacts are ever
  * retained. Eviction-on-access (rather than a registry of live apps)
  * keeps the memo dependency-free and correct under the only real usage
  * pattern: one live local[32] session at a time, suites starting fresh
  * sessions in sequence.
  *
  * Known residual bounds of that assumption (accepted by design): a
  * cache never touched again retains the stopped app's entries for the
  * JVM lifetime, and two CONCURRENTLY-live applications in one JVM
  * would evict each other's in-use entries on every access (correct but
  * rebuild-churning). If multi-live-session hosting ever becomes a
  * supported mode, switch eviction to a SparkListener on
  * `onApplicationEnd` instead of on-access.
  */
final class AppCache[V] {
  private val m =
    scala.collection.concurrent.TrieMap.empty[(String, String), V]

  /** Memoize `build` under (current applicationId, `key`). `key` encodes
    * the input directory plus any parameters (`s"$dir|$k|$iters"`). */
  def get(s: SparkSession, key: String)(build: => V): V = {
    val app = s.sparkContext.applicationId
    m.keySet.filter(_._1 != app).foreach(m.remove)
    m.getOrElseUpdate((app, key), build)
  }

  /** Drop every entry (bench plumbing — see Dedup.clearPairCaches). */
  def clear(): Unit = m.clear()
}

object AppCache {
  def apply[V](): AppCache[V] = new AppCache[V]
}
