package graft.log

import com.fasterxml.jackson.databind.ObjectMapper

/**
 * Live-table redirect (reference concept: redirect/TableRedirect.scala —
 * re-designed): a table property that points every query at this path to
 * a destination table, so a table can MOVE without breaking readers that
 * still resolve the old path.
 *
 * Property `graft.redirectReaderWriter` carries the same JSON shape the
 * Delta convert path already parses:
 * {{{
 *   {"type":"PathBasedRedirect","state":"REDIRECT-READY",
 *    "spec":{"tablePath":"/new/location"}}
 * }}}
 *
 * State machine (reference TableRedirect.scala:54-89):
 *   NO-REDIRECT -> ENABLE-REDIRECT-IN-PROGRESS -> REDIRECT-READY
 *   REDIRECT-READY -> DROP-REDIRECT-IN-PROGRESS -> NO-REDIRECT
 *   ENABLE-REDIRECT-IN-PROGRESS -> NO-REDIRECT (cancel)
 *
 * Enforcement:
 *  - [[GraftLog.forTable]] follows a REDIRECT-READY property to the
 *    destination (loop-guarded, 10-hop cap), so reads AND writes resolved
 *    through the public surface serve the destination;
 *  - in-progress states do NOT follow (reads still serve the source) but
 *    the source admits no file-changing commits in ANY redirect state —
 *    in-progress is read-only by contract, READY is frozen (see
 *    OptimisticTransaction.commit). State transitions are metadata-only
 *    commits and pass.
 */
object TableRedirect {

  val PROP = "graft.redirectReaderWriter"
  val STATE_ENABLE = "ENABLE-REDIRECT-IN-PROGRESS"
  val STATE_READY = "REDIRECT-READY"
  val STATE_DROP = "DROP-REDIRECT-IN-PROGRESS"

  final case class Redirect(state: String, dest: String)

  private val mapper = new ObjectMapper()

  def get(m: Metadata): Option[Redirect] =
    m.configuration.get(PROP).map { json =>
      val node = mapper.readTree(json)
      require(node.path("type").asText("") == "PathBasedRedirect",
        s"unknown redirect type '${node.path("type").asText("")}' in $PROP")
      // the reference serializes `spec` as a JSON string but documents it
      // inline too — accept both (same tolerance as the convert parser)
      val spec =
        if (node.path("spec").isTextual) mapper.readTree(node.path("spec").asText())
        else node.path("spec")
      val dest = spec.path("tablePath").asText("")
      require(dest.nonEmpty, s"$PROP names no spec.tablePath")
      Redirect(node.path("state").asText(""), dest)
    }

  /** Destination to FOLLOW: only a settled READY redirect moves queries. */
  def readyDest(m: Metadata): Option[String] =
    get(m).filter(_.state == STATE_READY).map(_.dest)

  def propertyJson(state: String, dest: String): String =
    s"""{"type":"PathBasedRedirect","state":${mapper.writeValueAsString(state)},""" +
      s""""spec":{"tablePath":${mapper.writeValueAsString(dest)}}}"""
}
