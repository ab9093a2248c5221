package graft.log

import java.nio.charset.StandardCharsets
import java.nio.file.FileAlreadyExistsException
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/**
 * One commit-arbitration record: the log file being created, the temp
 * object holding its contents, and whether the copy to the final name is
 * known to have finished. Entries expire (TTL) so the arbitration table
 * stays O(1) per table, not O(history).
 */
case class CommitEntry(
    fileName: String,
    tempPath: String,
    complete: Boolean,
    expireTimeMs: Long)

/**
 * External arbitration table for object stores with no native
 * put-if-absent: a conditional-write key-value store (DynamoDB-shaped)
 * that decides which writer owns each log file name. (Reference concept:
 * storage-s3-dynamodb BaseExternalLogStore/S3DynamoDBLogStore —
 * re-designed: trait + pluggable impl, recovery folded into list/read.)
 */
trait ExternalCommitStore {
  /** Record `entry` for (dir, entry.fileName) iff absent; true = we won. */
  def putIfAbsent(dir: String, entry: CommitEntry): Boolean
  def get(dir: String, fileName: String): Option[CommitEntry]
  /** The entry with the greatest fileName for `dir` (commits are named in
    * sort order, so this is the newest — the only one recovery needs). */
  def latest(dir: String): Option[CommitEntry]
  def markComplete(dir: String, fileName: String): Unit
}

/**
 * JVM-wide commit store standing in for DynamoDB in local runs and
 * tests: same conditional-write contract, same visibility across all
 * sessions in the process.
 */
object InMemoryCommitStore extends ExternalCommitStore {
  private val entries =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, CommitEntry]]()
  private def table(dir: String) =
    entries.computeIfAbsent(dir, _ => new ConcurrentHashMap[String, CommitEntry]())

  override def putIfAbsent(dir: String, entry: CommitEntry): Boolean = {
    prune(dir)
    table(dir).putIfAbsent(entry.fileName, entry) == null
  }
  override def get(dir: String, fileName: String): Option[CommitEntry] =
    Option(table(dir).get(fileName))
  override def latest(dir: String): Option[CommitEntry] = {
    val t = table(dir)
    import scala.jdk.CollectionConverters._
    t.keySet().asScala.maxOption.map(t.get)
  }
  override def markComplete(dir: String, fileName: String): Unit = {
    val t = table(dir)
    t.computeIfPresent(fileName, (_, e) => e.copy(complete = true))
    ()
  }
  /** Expired COMPLETE entries can go — the final file exists, so the
    * record has no recovery value. Incomplete entries are never pruned. */
  private def prune(dir: String): Unit = {
    val now = System.currentTimeMillis()
    val t = table(dir)
    t.forEach((k, e) => if (e.complete && e.expireTimeMs < now) { t.remove(k); () })
  }
  def clear(): Unit = entries.clear()
}

/**
 * LogStore for object stores WITHOUT put-if-absent (S3-classic shape):
 * mutual exclusion comes from an [[ExternalCommitStore]], not the
 * filesystem. The write protocol is
 *
 *   1. write the content to a unique temp object (overwrite-safe),
 *   2. claim the final name in the commit store with a conditional put —
 *      losing the race means another writer owns this version,
 *   3. copy temp -> final (plain overwrite; the claim makes it safe),
 *   4. mark the claim complete.
 *
 * A crash between 2 and 3 leaves a claimed-but-missing log file; every
 * list/read first "fixes up" the newest incomplete claim by re-copying
 * from the temp object, so readers always observe a log consistent with
 * the arbitration table. Enable with
 * `spark.graft.logStore.impl=graft.log.ExternalLogStore`.
 */
class ExternalLogStore(
    hadoopConf: Configuration,
    commitStore: ExternalCommitStore) extends LogStore(hadoopConf) {

  def this(hadoopConf: Configuration) = this(hadoopConf, InMemoryCommitStore)

  private val ttlMs = 24L * 3600 * 1000

  /** Test hook: simulates a writer dying after claiming but before the
    * final copy (step 2 -> 3 crash window). */
  @volatile private[graft] var crashBeforeCopy: Boolean = false

  // Every PUT here models an object-store PUT: no put-if-absent, but
  // ATOMIC VISIBILITY (a GET sees either nothing or the whole object,
  // never a prefix — S3/GCS/ABFS all guarantee this). The local-FS model
  // must preserve that: a plain create() exposes the file EMPTY between
  // create and close, and a concurrent snapshot refresh that caught a
  // commit in that window would fold it as a no-op and silently drop its
  // AddFiles from the cached state. writeOverwrite/copyOverwrite keep the
  // contract via temp-sibling + atomic move.

  /** The coordinated protocol streams end to end: chunks stream to the
    * temp object, the claim covers the temp, and the final name is a
    * byte-stream COPY of the temp — a multi-million-line commit (mirror
    * bootstrap, convert commit 0) never assembles as one driver string
    * even under external arbitration. */
  override def write(path: Path, chunks: Iterator[String]): Unit = {
    val dir = path.getParent
    fixup(dir)
    if (commitStore.get(dir.toString, path.getName).isDefined ||
        fs(path).exists(path)) {
      throw new FileAlreadyExistsException(path.toString)
    }
    val temp = new Path(dir,
      s".tmp-${java.util.UUID.randomUUID().toString.take(12)}-${path.getName}")
    writeOverwrite(temp, chunks) // streamed; invisible until claimed
    val entry = CommitEntry(path.getName, temp.toString, complete = false,
      System.currentTimeMillis() + ttlMs)
    if (!commitStore.putIfAbsent(dir.toString, entry)) {
      fs(temp).delete(temp, false)
      throw new FileAlreadyExistsException(path.toString)
    }
    if (crashBeforeCopy) return // claimed; final copy "lost" (test hook)
    copyOverwrite(temp, path)
    commitStore.markComplete(dir.toString, path.getName)
  }

  /** Re-copy the newest claimed-but-incomplete log file from its temp
    * object. Commits are strictly sequential per table (version N+1 is
    * only attempted after N reads back), so only the newest claim can be
    * dangling. */
  private def fixup(dir: Path): Unit = {
    commitStore.latest(dir.toString).filterNot(_.complete).foreach { e =>
      val target = new Path(dir, e.fileName)
      if (!fs(target).exists(target)) {
        val tempPath = new Path(e.tempPath)
        if (fs(tempPath).exists(tempPath)) {
          copyOverwrite(tempPath, target) // streamed, atomic visibility
        }
      }
      commitStore.markComplete(dir.toString, e.fileName)
    }
  }

  override def list(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    fixup(dir)
    super.list(dir).filterNot(_.getPath.getName.startsWith(".tmp-"))
  }

  override def read(path: Path): String = {
    fixup(path.getParent)
    super.read(path)
  }

  override def exists(path: Path): Boolean = {
    fixup(path.getParent)
    super.exists(path)
  }
}
