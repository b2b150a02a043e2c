package graft

import org.apache.spark.sql.DataFrame

/** Explicit lifecycle for query-level caches.
  *
  * Several registered queries cache an intermediate (verified dedup pairs,
  * quantized embeddings, the in-memory postings triple) because multiple
  * consumers — sometimes multiple QUERIES (dedup_minhash_lsh and
  * dedup_clusters share one candidate-gen + verify pass) — reuse it.
  * Bare `.cache()` has no owner: across a 90-query sweep the cached
  * subtrees accumulate for the JVM's life, and at cluster scale leaked
  * storage memory is a slow-motion OOM.
  *
  * Queries register every cache here instead; the sweep driver (Verify,
  * Bench, a user pipeline) calls releaseAll() at its natural boundary.
  * Releasing at the END of a sweep — not between queries — preserves the
  * cross-query sharing that is the point of the caches. Spark's
  * CacheManager dedupes identical plans, so re-registering the same
  * subtree on every invocation adds no storage and double-unpersist is a
  * no-op.
  */
object CacheRegistry {

  private val entries = scala.collection.mutable.ListBuffer[DataFrame]()
  private val cleanups = scala.collection.mutable.ListBuffer[() => Unit]()

  /** Cache `df` and register it for the next releaseAll(). */
  def cached(df: DataFrame): DataFrame = synchronized {
    val c = df.cache()
    entries += c
    c
  }

  /** Register a callback run at every releaseAll() — for memo tables that
    * hold references to registered caches (an entry surviving the release
    * would silently serve an unpersisted plan and recompute from scratch
    * on every use). Callbacks are permanent; keep them idempotent.
    */
  def onRelease(f: () => Unit): Unit = synchronized { cleanups += f }

  /** Unpersist every registered cache (idempotent). */
  def releaseAll(): Unit = synchronized {
    entries.foreach(_.unpersist(blocking = false))
    entries.clear()
    cleanups.foreach(_.apply())
  }

  def registeredCount: Int = synchronized(entries.size)

  /** `.registeredCache()` as a drop-in replacement for `.cache()`. */
  implicit class RegisteredCache(private val df: DataFrame) extends AnyVal {
    def registeredCache(): DataFrame = cached(df)
  }
}
