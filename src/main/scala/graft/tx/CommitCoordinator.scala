package graft.tx

import java.util.concurrent.ConcurrentHashMap

import graft.log.{FileNames, GraftLog}

/**
 * Coordinated commits: a table can delegate commit arbitration to a
 * named coordinator instead of relying on the log store's put-if-absent
 * primitive. On object stores without atomic create-if-absent this is
 * the only way to get mutual exclusion; it is also the hook for a
 * commit service that batches, orders, or replicates commits.
 * (Reference concept: the coordinatedCommits table feature +
 * coordinatedcommits/ package — re-designed: synchronous backfill, so
 * the published log directory stays the single source of truth and any
 * plain reader can read a coordinated table; asynchronous backfill with
 * reader-side coordinator lookups is a coordinator-implementation
 * concern, not a protocol change.)
 *
 * The coordinator CONTRACT: for a given table, at most one caller may
 * win each version, and the winner's commit file must be durable in the
 * log directory before `commit` returns. Losers receive
 * [[CoordinatedCommitConflictException]] and re-arbitrate after a
 * conflict check, exactly like a put-if-absent loser.
 */
trait CommitCoordinator {

  /** Publish `content` as commit `version` of `log`'s table, or throw
    * [[CoordinatedCommitConflictException]] if that version is taken. */
  def commit(log: GraftLog, version: Long, content: String): Unit

  /** Reader-side recovery hook (reference concept: getCommits on every
    * snapshot refresh of a coordinated table): a ledger-backed
    * coordinator republishes commits it accepted whose writer died
    * between arbitration and the synchronous backfill, so the next
    * reader/writer observes them instead of a stale FS log. Returns
    * true iff anything was republished — the caller re-lists the log
    * then. Default no-op: for coordinators whose durable file write IS
    * the arbitration record (like [[InProcessCoordinator]]) there is
    * no crash window to heal. */
  def ensureBackfilled(log: GraftLog): Boolean = false
}

class CoordinatedCommitConflictException(val version: Long)
  extends RuntimeException(s"commit version $version already arbitrated")

/** Registry of named coordinators (table property
  * `graft.coordinatedCommits.coordinator` selects one). */
object CommitCoordinators {
  private val registry = new ConcurrentHashMap[String, CommitCoordinator]()

  def register(name: String, coordinator: CommitCoordinator): Unit =
    registry.put(name, coordinator)

  def get(name: String): Option[CommitCoordinator] = Option(registry.get(name))

  register("in-process", InProcessCoordinator)
}

/**
 * Single-JVM coordinator: one lock per table path. Inside the lock the
 * commit is written with an UNCONDITIONAL overwrite after an existence
 * check — the mutual exclusion comes from the coordinator's
 * arbitration, not from any filesystem primitive, which is exactly the
 * property a cloud deployment needs (swap this object for one backed by
 * a lock service / conditional-write database; the engine contract is
 * identical). Useful as-is for single-driver deployments on stores
 * without put-if-absent, and as the deterministic arbiter in tests.
 */
object InProcessCoordinator extends CommitCoordinator {
  private val tableLocks = new ConcurrentHashMap[String, Object]()

  override def commit(log: GraftLog, version: Long, content: String): Unit = {
    val lock = tableLocks.computeIfAbsent(
      log.logPath.toString, _ => new Object)
    lock.synchronized {
      val target = FileNames.deltaFile(log.logPath, version)
      if (log.store.exists(target))
        throw new CoordinatedCommitConflictException(version)
      log.store.writeOverwrite(target, content)
    }
  }
}
