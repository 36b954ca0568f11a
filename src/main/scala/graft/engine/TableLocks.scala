package graft.engine

import java.util.concurrent.locks.ReentrantLock
import scala.collection.concurrent.TrieMap

/** JVM-wide per-table writer locks — the single-process surrogate of the
  * optimistic-commit protocol a lake catalog gives a real deployment.
  *
  * Policy (tested by ConcurrencySpec, documented in IMPLEMENTATION.md):
  *   - WRITER-WRITER: every mutating statement (INSERT, COPY, UPDATE /
  *     DELETE / MERGE, OPTIMIZE, DT REFRESH) holds its target table's
  *     lock for the statement, so concurrent writers serialize per table
  *     and the outcome equals SOME serial order. Multi-table acquisition
  *     (DT refresh locks its bases too) sorts canonical paths first, so
  *     lock order is global and deadlock-free.
  *   - WRITER-READER: reads don't lock. Appends are safe (a read plans
  *     over the files it listed; new files land unseen). A read racing a
  *     COW rewrite of the SAME files can fail LOUDLY (FileNotFound on a
  *     replaced file) but can never silently mix pre- and post-state
  *     rows of one file. Snapshot isolation for readers is what Iceberg
  *     metadata-addressed scans provide (IcebergLite tables read a
  *     pinned manifest and are immune); plain lake tables accept the
  *     loud-retry contract.
  *
  * At 100 TB the lock cost is pure metadata — file listing and commit
  * windows — never data movement; writers on DIFFERENT tables never
  * contend. The reference has no concurrent-writer story at all (one
  * DuckDB per session, last-write-wins on the catalog), so this is a
  * strictly stronger contract.
  */
object TableLocks {
  private val locks = TrieMap.empty[String, ReentrantLock]

  /** Lock keys are normalized FQN strings (`FQN.flat`), NOT storage
    * paths: an Iceberg commit moves the table's metadata path, so a
    * path key would let two writers straddling a commit lock different
    * objects, while the name is stable for the table's lifetime. */
  private def lockFor(key: String): ReentrantLock =
    locks.getOrElseUpdate(key, new ReentrantLock)

  /** Run `f` holding the locks of every key in `keys` (deduped,
    * acquired in sorted order — a global order, so two statements
    * locking overlapping sets cannot deadlock). Reentrant: a statement
    * already holding a lock may re-enter (MERGE planning resolves its
    * own target). */
  def withLocks[T](keys: Seq[String])(f: => T): T = {
    val ls = keys.distinct.sorted.map(lockFor)
    ls.foreach(_.lock())
    try f finally ls.reverse.foreach(_.unlock())
  }
}
