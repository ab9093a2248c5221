package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path

import graft.log.{Actions, LogStore, Metadata}

/** One adopted read schema: the stream reads with `metadata`'s schema for
  * all versions at or after `tableVersion`, until a later entry supersedes
  * it. */
case class TrackedSchema(seqNum: Long, tableVersion: Long, metadata: Metadata)

/**
 * Persistent log of the schemas a streaming query has adopted, stored
 * under the query's checkpoint-adjacent `schemaTrackingLocation`. Entries
 * are sequence-numbered files written put-if-absent, so concurrent
 * restarts of the same query cannot fork the schema history. The stream
 * reads with the LATEST entry's schema; when the source hits a
 * non-read-compatible metadata commit it drains everything before it,
 * appends the new schema here, and fails the query with a restart
 * instruction — the restarted query picks the adopted schema up from this
 * log and continues past the change. (Reference concept:
 * sources/DeltaSourceMetadataTrackingLog.scala,
 * streaming/SchemaTrackingLog.scala — re-designed: seq-numbered
 * put-if-absent JSON entries reusing the action codec, no OffsetSeqLog
 * machinery.)
 */
class SchemaTrackingLog(store: LogStore, location: Path) {
  private val dir = new Path(location, "_graft_schema_log")
  private def entryFile(seq: Long): Path = new Path(dir, f"$seq%020d.json")

  private val mapper = new ObjectMapper()

  private def parse(json: String): TrackedSchema = {
    val node = mapper.readTree(json)
    val meta = Actions.fromJson(node.get("metadataJson").asText()) match {
      case m: Metadata => m
      case other => throw new IllegalStateException(
        s"schema log entry holds ${other.getClass.getSimpleName}, expected metaData")
    }
    TrackedSchema(node.get("seqNum").asLong(), node.get("tableVersion").asLong(), meta)
  }

  def latest(): Option[TrackedSchema] = {
    val names = store.list(dir).map(_.getPath)
      .filter(_.getName.endsWith(".json"))
    names.lastOption.map(p => parse(store.read(p)))
  }

  /** Append the next entry; throws FileAlreadyExistsException if a
    * concurrent restart won the sequence number. */
  def append(tableVersion: Long, metadata: Metadata): TrackedSchema = {
    val seq = latest().map(_.seqNum + 1).getOrElse(0L)
    val root = mapper.createObjectNode()
    root.put("seqNum", seq)
    root.put("tableVersion", tableVersion)
    root.put("metadataJson", Actions.toJson(metadata))
    store.write(entryFile(seq), mapper.writeValueAsString(root))
    TrackedSchema(seq, tableVersion, metadata)
  }
}
