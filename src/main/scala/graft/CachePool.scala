package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** GENERATIONAL persist registry for per-invocation intermediate
  * frames — the lifecycle answer for kernels that must persist a
  * frame consumed on both sides of a self-join (the substring
  * family's anchor fingerprints, the served-NB model frames) but
  * whose RESULT is returned lazily, so the callee can never
  * `unpersist()` before evaluation.
  *
  * The [[graft.operators.Dedup.shingledCached]] memo solves this for
  * one shared frame; this pool generalizes the same bound to any
  * keyed frame set: `swap(key, frames…)` persists the new generation
  * and unpersists the PREVIOUS generation under the same key, so a
  * long-lived session (the Bench sweep loop, a notebook) holds at
  * most ONE generation of cached blocks per kernel instead of one
  * per invocation.
  *
  * CONTRACT (r15 advisory): pooled frames must be DETERMINISTIC —
  * two call sites may share a key (the substring family does), so
  * one operator's swap can strip the cache behind another's
  * still-unevaluated result, which then RECOMPUTES from lineage; a
  * nondeterministic frame would recompute to different values. The
  * pool also releases ONLY the frames it persisted itself: a frame
  * that arrives already persisted (an external memo like
  * `shingledCached` passed through a pool call) keeps its owner's
  * pin — the superseding swap must not clobber a cache it never
  * created.
  */
object CachePool {

  /** Current generation per key; the Boolean records whether THIS
    * pool issued the persist (and therefore owns the unpersist). */
  private val pool =
    scala.collection.mutable.HashMap.empty[String, Seq[(DataFrame, Boolean)]]

  /** Persist `frames` (MEMORY_AND_DISK) as the current generation for
    * `key`, releasing whatever generation held the key before —
    * pool-persisted frames only; externally persisted frames keep
    * their owner's pin. Returns the frames for inline use. */
  def swap(key: String, frames: DataFrame*): Seq[DataFrame] = synchronized {
    pool.get(key).foreach(_.foreach { case (f, ownedHere) =>
      if (ownedHere) scala.util.Try(f.unpersist())
    })
    pool(key) = frames.map { f =>
      val own = f.storageLevel == StorageLevel.NONE
      if (own) f.persist(StorageLevel.MEMORY_AND_DISK)
      (f, own)
    }
    frames
  }

  /** Single-frame convenience over [[swap]]. */
  def swapOne(key: String, frame: DataFrame): DataFrame =
    swap(key, frame).head

  /** Release the MEMORY_AND_DISK blocks behind LOCALLY-CHECKPOINTED
    * frames (the session-memo discipline: curate upstreams, pooled
    * pair legs). A localCheckpoint's blocks sit OUTSIDE the catalog
    * cache — that is why the memos use it — so `df.unpersist()`
    * cannot reach them; the checkpointed RDD hanging off the
    * `LogicalRDD` leaf holds the only handle. Without this, a long
    * session alternating datasets keeps superseded generations alive
    * until GC + ContextCleaner get around to them (the r16 advisory). */
  def freeLocalCheckpoint(frames: DataFrame*): Unit =
    frames.foreach { df =>
      scala.util.Try {
        df.queryExecution.analyzed.foreach {
          case r: org.apache.spark.sql.execution.LogicalRDD =>
            r.rdd.unpersist(blocking = false)
          case _ => ()
        }
      }
      ()
    }

  /** Release every pool-persisted generation (test/session hygiene). */
  def clear(): Unit = synchronized {
    pool.valuesIterator.foreach(_.foreach { case (f, ownedHere) =>
      if (ownedHere) scala.util.Try(f.unpersist())
    })
    pool.clear()
  }
}
