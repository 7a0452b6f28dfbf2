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
  * per invocation. Unpersisting a superseded generation is always
  * safe — Spark recomputes evicted blocks from lineage — so a stale
  * reader degrades to recompute, never to wrong results.
  */
object CachePool {

  private val pool =
    scala.collection.mutable.HashMap.empty[String, Seq[DataFrame]]

  /** Persist `frames` (MEMORY_AND_DISK) as the current generation for
    * `key`, releasing whatever generation held the key before.
    * Returns the frames for inline use. */
  def swap(key: String, frames: DataFrame*): Seq[DataFrame] = synchronized {
    pool.get(key).foreach(_.foreach(f => scala.util.Try(f.unpersist())))
    frames.foreach { f =>
      if (f.storageLevel == StorageLevel.NONE)
        f.persist(StorageLevel.MEMORY_AND_DISK)
    }
    pool(key) = frames
    frames
  }

  /** Single-frame convenience over [[swap]]. */
  def swapOne(key: String, frame: DataFrame): DataFrame =
    swap(key, frame).head

  /** Release every generation (test/session hygiene). */
  def clear(): Unit = synchronized {
    pool.valuesIterator.foreach(_.foreach(f =>
      scala.util.Try(f.unpersist())))
    pool.clear()
  }
}
