package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}

/** Per-application keyed cache for amortized deterministic artifacts
  * (localCheckpointed frames, driver-held index arrays): production
  * builds these once per session and serves many consumers, so repeated
  * gate/bench passes must not recompute them. One instance per artifact
  * family (c3's verified pair set, c16's cluster frame, the RAG
  * shortlist, c24's trained quantizer).
  *
  * Contract: `compute` must be DETERMINISTIC for a given (application,
  * scope) — every consumer sees the identical value. Entries are
  * evicted when their application ends (a JVM hosting many sequential
  * sessions must not accumulate dead-session frames), via ONE listener
  * per SparkContext per cache — not one per entry, which would stack
  * duplicate cleanup work in sessions touching several scopes (the
  * round-10 advisor finding on the old open-coded copies of this
  * pattern).
  *
  * The synchronized compute-and-insert matters: TrieMap.getOrElseUpdate
  * may run the thunk twice under a concurrent first call, orphaning an
  * eagerly-computed checkpoint's blocks. The lock is only contended on
  * the first call per (application, scope).
  */
final class AppScopedCache[V] {
  private val entries = TrieMap.empty[(String, String), V]
  private val registered = scala.collection.mutable.Set.empty[String]

  def getOrElseUpdate(sc: SparkContext, scope: String)(compute: => V): V = {
    val key = (sc.applicationId, scope)
    entries.get(key).getOrElse(entries.synchronized {
      entries.getOrElseUpdate(
        key, {
          if (registered.add(sc.applicationId)) {
            sc.addSparkListener(new SparkListener {
              override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
                entries.synchronized {
                  entries.filterInPlace { case ((app, _), _) => app != sc.applicationId }
                  registered.remove(sc.applicationId): Unit
                }
            })
          }
          compute
        }
      )
    })
  }
}
