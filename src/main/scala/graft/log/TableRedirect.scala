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

  /** Writer-only variant (reference redirect/TableRedirect.scala:433-443 +
    * TableFeature.scala:757 RedirectWriterOnlyFeature): SAME property
    * shape, state machine and in-engine routing — the reference's
    * `needRedirect` (TableRedirect.scala:264-268) checks only the state,
    * never the kind, so an engine that implements redirects follows a
    * READY writer-only redirect exactly like the reader-writer form. The
    * difference is the PROTOCOL gate: writer-only registers as a WRITER
    * feature, so legacy reader clients that know nothing of redirects may
    * legally keep reading the frozen source (a writer feature never
    * blocks reads), while every writer — which must support writer
    * features — lands at the destination. That is the gradual-migration
    * contract: old readers stay up on the source until they upgrade. */
  val PROP_WRITER_ONLY = "graft.redirectWriterOnly"

  val STATE_ENABLE = "ENABLE-REDIRECT-IN-PROGRESS"
  val STATE_READY = "REDIRECT-READY"
  val STATE_DROP = "DROP-REDIRECT-IN-PROGRESS"

  /** Per-application redirect exemption (reference
    * redirect/TableRedirect.scala:182-207 NoRedirectRule): a session whose
    * `spark.app.name` matches `appName` (empty = every application) keeps
    * resolving the SOURCE even while the redirect is READY — the staged-
    * migration escape hatch for e.g. a validation job that must keep
    * reading the frozen source. `allowedOperations` additionally names the
    * commit operations such an application may still run AT the source
    * (reference OptimisticTransaction.scala:1757-1784
    * performNoRedirectRulesCheck); empty = read-only exemption. */
  final case class NoRedirectRule(appName: Option[String],
      allowedOperations: Set[String])

  final case class Redirect(state: String, dest: String,
      writerOnly: Boolean = false,
      noRedirectRules: Seq[NoRedirectRule] = Nil) {
    def prop: String = if (writerOnly) PROP_WRITER_ONLY else PROP
  }

  private val mapper = new ObjectMapper()

  /** The live redirect, reader-writer taking precedence over writer-only
    * when both appear (reference RedirectFeature.getRedirectConfiguration
    * — though setting one while the other is set refuses upstream). */
  def get(m: Metadata): Option[Redirect] =
    parse(m, PROP).orElse(parse(m, PROP_WRITER_ONLY))

  private def parse(m: Metadata, prop: String): Option[Redirect] =
    m.configuration.get(prop).map { json =>
      val node = mapper.readTree(json)
      require(node.path("type").asText("") == "PathBasedRedirect",
        s"unknown redirect type '${node.path("type").asText("")}' in $prop")
      // the reference serializes `spec` as a JSON string but documents it
      // inline too — accept both (same tolerance as the convert parser)
      val spec =
        if (node.path("spec").isTextual) mapper.readTree(node.path("spec").asText())
        else node.path("spec")
      val dest = spec.path("tablePath").asText("")
      require(dest.nonEmpty, s"$prop names no spec.tablePath")
      Redirect(node.path("state").asText(""), dest,
        writerOnly = prop == PROP_WRITER_ONLY,
        noRedirectRules = rulesOf(node.path("noRedirectRules")))
    }

  private def rulesOf(arr: com.fasterxml.jackson.databind.JsonNode):
      Seq[NoRedirectRule] =
    if (arr == null || !arr.isArray) Nil
    else (0 until arr.size()).map { i =>
      val r = arr.get(i)
      val app = Option(r.get("appName")).map(_.asText("")).filter(_.nonEmpty)
      val ops = Option(r.get("allowedOperations")).toSeq
        .flatMap(n => (0 until n.size()).map(n.get(_).asText()))
      NoRedirectRule(app, ops.toSet)
    }

  /** Parse a bare rules array (the property JSON's `noRedirectRules`
    * value) — the cross-language entry point (python passes JSON). */
  def parseRules(json: String): Seq[NoRedirectRule] =
    rulesOf(mapper.readTree(json))

  /** Destination to FOLLOW: only a settled READY redirect moves queries. */
  def readyDest(m: Metadata): Option[String] =
    get(m).filter(_.state == STATE_READY).map(_.dest)

  /** The session's application name, per-session override first (tests and
    * multi-tenant sessions set `spark.app.name` in session conf). */
  private def appName(spark: org.apache.spark.sql.SparkSession): String =
    try spark.conf.get("spark.app.name", spark.sparkContext.appName)
    catch { case _: Exception => spark.sparkContext.appName }

  /** Whether THIS session is exempt from following the redirect: some rule
    * names its application, or a rule names no application at all
    * (reference TableRedirect.scala:258-263 isNoRedirectApp — an
    * appName-less rule applies to every application). */
  def isNoRedirectApp(r: Redirect,
      spark: org.apache.spark.sql.SparkSession): Boolean = {
    val app = appName(spark)
    r.noRedirectRules.exists(_.appName.forall(_.equalsIgnoreCase(app)))
  }

  /** Destination THIS session follows: a settled READY redirect moves
    * queries unless a no-redirect rule exempts the application (reference
    * TableRedirect.scala:264-268 needRedirect). */
  def followDest(m: Metadata,
      spark: org.apache.spark.sql.SparkSession): Option[String] =
    get(m).filter(r => r.state == STATE_READY && !isNoRedirectApp(r, spark))
      .map(_.dest)

  /** Whether a no-redirect rule matching THIS application allows committing
    * `operation` at the redirect SOURCE (reference
    * OptimisticTransaction.scala:1770-1783: among the rules whose appName
    * matches — or is absent — one must list the operation). The appName
    * match is case-insensitive but the OPERATION match is case-sensitive,
    * mirroring the reference's `Set.contains(op.name)` in
    * performNoRedirectRulesCheck — a rule listing "write" does not admit
    * "WRITE". */
  def allowsOperation(r: Redirect,
      spark: org.apache.spark.sql.SparkSession, operation: String): Boolean = {
    val app = appName(spark)
    r.noRedirectRules
      .filter(_.appName.forall(_.equalsIgnoreCase(app)))
      .exists(_.allowedOperations.contains(operation))
  }

  def propertyJson(state: String, dest: String,
      rules: Seq[NoRedirectRule] = Nil): String = {
    val rulesJson =
      if (rules.isEmpty) ""
      else rules.map { r =>
        val app = r.appName.map(a =>
          s""""appName":${mapper.writeValueAsString(a)},""").getOrElse("")
        val ops = r.allowedOperations.toSeq.sorted
          .map(mapper.writeValueAsString).mkString("[", ",", "]")
        s"""{$app"allowedOperations":$ops}"""
      }.mkString(""","noRedirectRules":[""", ",", "]")
    s"""{"type":"PathBasedRedirect","state":${mapper.writeValueAsString(state)},""" +
      s""""spec":{"tablePath":${mapper.writeValueAsString(dest)}}$rulesJson}"""
  }
}
