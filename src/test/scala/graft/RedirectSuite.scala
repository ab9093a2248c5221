package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Live-table redirect: ENABLE -> READY -> DROP state machine; READY
  * serves every public-path query at the destination. */
class RedirectSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmpDir(): String = Files.createTempDirectory("graft-redir").toString

  private def ids(path: String): Set[Long] =
    Graft.read(spark, path).select("id").as[Long].collect().toSet

  test("READY redirect serves reads AND writes at the destination; drop restores") {
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 5).toDF("id"), src)
    Graft.write(spark.range(100, 103).toDF("id"), dst)
    GraftTable.forPath(spark, src).redirectTo(dst)
    // reads at the source path serve the destination
    assert(ids(src) === (100L until 103L).toSet)
    // writes resolved through the source path land at the destination
    Graft.write(spark.range(103, 105).toDF("id"), src)
    assert(ids(dst) === (100L until 105L).toSet)
    assert(ids(src) === ids(dst))
    // DML through the public path operates on the destination
    GraftTable.forPath(spark, src).delete($"id" === 104L)
    assert(ids(dst) === (100L until 104L).toSet)
    // the source's own data is frozen, not lost
    val raw = GraftTable.forPathNoRedirect(spark, src)
    assert(raw.toDF.select("id").as[Long].collect().toSet === (0L until 5L).toSet)
    // protocol carries the reader-gating feature
    assert(raw.snapshot.protocol.readerFeatureNames.contains("redirectReaderWriter"))
    // drop restores normal service (two commits: DROP-IN-PROGRESS, then clear)
    raw.dropRedirect()
    assert(ids(src) === (0L until 5L).toSet)
    Graft.write(spark.range(5, 7).toDF("id"), src)
    assert(ids(src) === (0L until 7L).toSet)
    assert(ids(dst) === (100L until 104L).toSet)
  }

  test("mid-transition: reads serve the source, data writes refuse, cancel restores") {
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 4).toDF("id"), src)
    Graft.write(spark.range(50, 51).toDF("id"), dst)
    val t = GraftTable.forPath(spark, src)
    t.enableRedirect(dst)
    // ENABLE-IN-PROGRESS does not follow: reads still serve the source
    assert(ids(src) === (0L until 4L).toSet)
    // ... but the source is read-only: file-changing commits refuse by name
    val e = intercept[UnsupportedOperationException] {
      Graft.write(spark.range(10, 12).toDF("id"), src)
    }
    assert(e.getMessage.contains("redirected") &&
      e.getMessage.contains("ENABLE-REDIRECT-IN-PROGRESS"), e.getMessage)
    val e2 = intercept[UnsupportedOperationException] { t.delete($"id" === 0L) }
    assert(e2.getMessage.contains("redirected"), e2.getMessage)
    // cancel: back to normal service
    t.cancelRedirect()
    Graft.write(spark.range(10, 12).toDF("id"), src)
    assert(ids(src) === ((0L until 4L) ++ (10L until 12L)).toSet)
  }

  test("cycle and self-redirect refuse; invalid transitions refuse") {
    val a = tmpDir(); val b = tmpDir()
    Graft.write(spark.range(0, 2).toDF("id"), a)
    Graft.write(spark.range(5, 7).toDF("id"), b)
    val ta = GraftTable.forPath(spark, a)
    val eSelf = intercept[IllegalArgumentException] { ta.enableRedirect(a) }
    assert(eSelf.getMessage.contains("itself"))
    // a -> b READY; then b -> a must refuse (cycle)
    ta.redirectTo(b)
    val tb = GraftTable.forPath(spark, b)
    val eCycle = intercept[IllegalArgumentException] { tb.enableRedirect(a) }
    assert(eCycle.getMessage.contains("cycle"), eCycle.getMessage)
    // invalid transitions by name
    val eBad = intercept[IllegalArgumentException] {
      GraftTable.forPathNoRedirect(spark, a).completeRedirect()
    }
    assert(eBad.getMessage.contains("invalid redirect transition"), eBad.getMessage)
    val eBad2 = intercept[IllegalArgumentException] { tb.dropRedirect() }
    assert(eBad2.getMessage.contains("invalid redirect transition"))
    // enabling ON an already-READY source refuses (must drop first)
    val eBad3 = intercept[IllegalArgumentException] {
      GraftTable.forPathNoRedirect(spark, a).enableRedirect(b)
    }
    assert(eBad3.getMessage.contains("invalid redirect transition"))
    GraftTable.forPathNoRedirect(spark, a).dropRedirect()
    assert(ids(a) === (0L until 2L).toSet)
  }

  test("raw property set/unset routes through the validated state machine") {
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 3).toDF("id"), src)
    Graft.write(spark.range(9, 12).toDF("id"), dst)
    val t = GraftTable.forPath(spark, src)
    // a direct READY set must refuse (NO-REDIRECT -> READY is illegal)
    val e = intercept[IllegalArgumentException] {
      t.upsertProperties(Map(graft.log.TableRedirect.PROP ->
        graft.log.TableRedirect.propertyJson(
          graft.log.TableRedirect.STATE_READY, dst)))
    }
    assert(e.getMessage.contains("invalid redirect transition"), e.getMessage)
    // the legal two-step property dance works (what ALTER TABLE would do)
    t.upsertProperties(Map(graft.log.TableRedirect.PROP ->
      graft.log.TableRedirect.propertyJson(
        graft.log.TableRedirect.STATE_ENABLE, dst)))
    t.upsertProperties(Map(graft.log.TableRedirect.PROP ->
      graft.log.TableRedirect.propertyJson(
        graft.log.TableRedirect.STATE_READY, dst)))
    assert(ids(src) === Set(9L, 10L, 11L))
    // raw unset from READY refuses; from DROP-IN-PROGRESS completes
    val raw = GraftTable.forPathNoRedirect(spark, src)
    val e2 = intercept[IllegalArgumentException] {
      raw.removeProperties(Seq(graft.log.TableRedirect.PROP))
    }
    assert(e2.getMessage.contains("invalid redirect transition"))
    raw.upsertProperties(Map(graft.log.TableRedirect.PROP ->
      graft.log.TableRedirect.propertyJson(
        graft.log.TableRedirect.STATE_DROP, dst)))
    raw.removeProperties(Seq(graft.log.TableRedirect.PROP))
    assert(ids(src) === Set(0L, 1L, 2L))
    // junk values refuse with a parse error, never land in the log
    val e3 = intercept[Exception] {
      GraftTable.forPath(spark, src).upsertProperties(
        Map(graft.log.TableRedirect.PROP -> """{"state":"REDIRECT-READY"}"""))
    }
    assert(!GraftTable.forPath(spark, src).snapshot.metadata
      .configuration.contains(graft.log.TableRedirect.PROP))
  }

  test("streaming read through a redirected path serves the destination") {
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 4).toDF("id"), src)
    Graft.write(spark.range(200, 206).toDF("id"), dst)
    GraftTable.forPath(spark, src).redirectTo(dst)
    val out = java.nio.file.Files.createTempDirectory("graft-redir-sink").toString
    val q = spark.readStream.format("graft").load(src)
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    val got = spark.read.parquet(s"$out/data").as[Long].collect().toSet
    assert(got === (200L until 206L).toSet,
      s"stream served $got, expected the destination's rows")
  }

  test("time travel through a redirected path addresses the destination's history") {
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 3).toDF("id"), src)
    Graft.write(spark.range(100, 104).toDF("id"), dst)      // dst v0
    GraftTable.forPath(spark, dst).delete($"id" >= 102L)     // dst v1
    GraftTable.forPath(spark, src).redirectTo(dst)
    // latest through the old path = dst v1
    assert(ids(src) === Set(100L, 101L))
    // versionAsOf through the old path pins DST's version 0
    assert(spark.read.format("graft").option("versionAsOf", "0").load(src)
      .select("id").as[Long].collect().toSet === (100L until 104L).toSet)
  }

  test("writer-only: same routing, but the protocol gates WRITERS only") {
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 5).toDF("id"), src)
    Graft.write(spark.range(100, 103).toDF("id"), dst)
    GraftTable.forPath(spark, src).redirectToWriterOnly(dst)
    // a redirect-aware engine routes reads AND writes to the destination
    // (reference needRedirect, TableRedirect.scala:264-268, checks only
    // the state — the kinds differ in the protocol gate, not the routing)
    assert(ids(src) === (100L until 103L).toSet)
    Graft.write(spark.range(103, 105).toDF("id"), src)
    assert(ids(dst) === (100L until 105L).toSet)
    // THE writer-only contract: no reader gate — a legacy reader that
    // knows nothing of redirects may legally keep reading the frozen
    // source (reader protocol stays legacy; the feature is writer-side)
    val raw = GraftTable.forPathNoRedirect(spark, src)
    val proto = raw.snapshot.protocol
    assert(proto.writerFeatureNames.contains("redirectWriterOnly"), proto)
    assert(!proto.readerFeatureNames.contains("redirectWriterOnly"), proto)
    assert(proto.minReaderVersion < 3,
      s"writer-only redirect must not bump the reader protocol: $proto")
    assert(raw.toDF.select("id").as[Long].collect().toSet === (0L until 5L).toSet)
    // the frozen source still refuses file-changing commits via raw handles
    val e = intercept[UnsupportedOperationException] { raw.delete() }
    assert(e.getMessage.contains("redirected"), e.getMessage)
    // drop restores normal service
    raw.dropRedirect()
    assert(ids(src) === (0L until 5L).toSet)
  }

  test("writer-only and reader-writer are mutually exclusive; kind binds transitions") {
    val src = tmpDir(); val d1 = tmpDir(); val d2 = tmpDir()
    Graft.write(spark.range(0, 2).toDF("id"), src)
    Graft.write(spark.range(5, 6).toDF("id"), d1)
    Graft.write(spark.range(7, 8).toDF("id"), d2)
    val t = GraftTable.forPath(spark, src)
    t.enableRedirect(d1, writerOnly = true)
    // a second redirect of the OTHER kind refuses (reference
    // RedirectFeature.validateTableRedirect)
    val e = intercept[IllegalArgumentException] {
      GraftTable.forPathNoRedirect(spark, src).enableRedirect(d2)
    }
    assert(e.getMessage.contains("invalid redirect transition"), e.getMessage)
    // raw property transitions must address the live redirect's KIND:
    // completing via the reader-writer key refuses
    val e2 = intercept[IllegalArgumentException] {
      GraftTable.forPathNoRedirect(spark, src).upsertProperties(
        Map(graft.log.TableRedirect.PROP ->
          graft.log.TableRedirect.propertyJson(
            graft.log.TableRedirect.STATE_READY, d1)))
    }
    assert(e2.getMessage.contains("kind and destination"), e2.getMessage)
    // ... and via the right key with the WRONG destination refuses too
    val e3 = intercept[IllegalArgumentException] {
      GraftTable.forPathNoRedirect(spark, src).upsertProperties(
        Map(graft.log.TableRedirect.PROP_WRITER_ONLY ->
          graft.log.TableRedirect.propertyJson(
            graft.log.TableRedirect.STATE_DROP, d2)))
    }
    assert(e3.getMessage.contains("kind and destination"), e3.getMessage)
    // the matching key + dest completes; drop via raw properties works
    GraftTable.forPathNoRedirect(spark, src).upsertProperties(
      Map(graft.log.TableRedirect.PROP_WRITER_ONLY ->
        graft.log.TableRedirect.propertyJson(
          graft.log.TableRedirect.STATE_READY, d1)))
    assert(ids(src) === Set(5L))
    GraftTable.forPathNoRedirect(spark, src).dropRedirect()
    assert(ids(src) === Set(0L, 1L))
  }

  test("RESTORE cannot launder the redirect freeze away (gate + property carry-over)") {
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 3).toDF("id"), src)          // src v0
    Graft.write(spark.range(3, 6).toDF("id"), src)          // src v1
    Graft.write(spark.range(100, 102).toDF("id"), dst)
    GraftTable.forPath(spark, src).redirectTo(dst)
    // restoring the SOURCE to a pre-redirect version through a raw
    // handle would both fork the frozen data and silently clear the
    // redirect property — the commit gate refuses on the snapshot's
    // state (the state being transitioned FROM), so the post-update
    // metadata cannot launder it
    val raw = GraftTable.forPathNoRedirect(spark, src)
    val e = intercept[UnsupportedOperationException] { raw.restoreToVersion(0) }
    assert(e.getMessage.contains("redirected"), e.getMessage)
    // the redirect survived, byte-for-byte
    assert(graft.log.TableRedirect.get(raw.snapshot.metadata)
      .exists(_.state == graft.log.TableRedirect.STATE_READY))
    assert(ids(src) === Set(100L, 101L))
    // redirect state is LIVE state, not part of what RESTORE reverts:
    // after a legal DROP, restoring to a version whose configuration
    // carried the READY redirect must NOT resurrect it out-of-band
    // (that would re-freeze the table and re-route queries with no
    // state-machine transition). The files never changed across these
    // versions, so this restore is metadata-only — exactly the commit a
    // files-only gate would admit.
    val readyVersion = raw.version - 2 // the REDIRECT READY commit
    raw.dropRedirect()
    GraftTable.forPath(spark, src).restoreToVersion(readyVersion)
    val m = GraftTable.forPath(spark, src).snapshot.metadata
    assert(graft.log.TableRedirect.get(m).isEmpty,
      s"RESTORE resurrected a dropped redirect: ${m.configuration}")
    assert(ids(src) === (0L until 6L).toSet)
  }

  test("raw-handle history stays source-local; follow survives a cache clear") {
    // history/time-travel on the RAW handle still reads the source log
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 3).toDF("id"), src)
    Graft.write(spark.range(9, 10).toDF("id"), dst)
    GraftTable.forPath(spark, src).redirectTo(dst)
    val raw = GraftTable.forPathNoRedirect(spark, src)
    val ops = raw.history().select($"operation").as[String].collect().toSeq
    assert(ops.contains("REDIRECT ENABLE") && ops.contains("REDIRECT READY"))
    // public-path reads keep serving the destination after a log-cache clear
    graft.log.GraftLog.clearCache()
    assert(ids(src) === Set(9L))
  }

  /** Run `body` with the session's application name overridden (the
    * per-session conf wins over the SparkContext name), restoring after. */
  private def withAppName[A](name: String)(body: => A): A = {
    spark.conf.set("spark.app.name", name)
    try body finally spark.conf.unset("spark.app.name")
  }

  test("noRedirectRules: named app resolves the source, others the destination") {
    import graft.log.TableRedirect
    import graft.log.TableRedirect.NoRedirectRule
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 5).toDF("id"), src)
    Graft.write(spark.range(100, 103).toDF("id"), dst)
    GraftTable.forPath(spark, src).redirectTo(dst,
      Seq(NoRedirectRule(Some("validation-job"), Set.empty)))
    // this session (app "graft-test") matches no rule: follows to dest
    assert(ids(src) === (100L until 103L).toSet)
    // the named application keeps resolving the frozen SOURCE
    withAppName("Validation-Job") { // match is case-insensitive
      assert(ids(src) === (0L until 5L).toSet)
      // ... but the writer gate still applies: the rule allows no
      // operations, so a write at the source refuses by name
      val e = intercept[UnsupportedOperationException] {
        Graft.write(spark.range(10, 12).toDF("id"), src)
      }
      assert(e.getMessage.contains("redirected"), e.getMessage)
    }
    // back on the default app name, service is at the destination again
    assert(ids(src) === (100L until 103L).toSet)
    // the rules survived the ENABLE -> READY transition in the property
    val live = TableRedirect.get(
      GraftTable.forPathNoRedirect(spark, src).snapshot.metadata).get
    assert(live.state === TableRedirect.STATE_READY)
    assert(live.noRedirectRules ===
      Seq(NoRedirectRule(Some("validation-job"), Set.empty)))
  }

  test("noRedirectRules: allowedOperations admit named commits at the source") {
    import graft.log.TableRedirect.NoRedirectRule
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 5).toDF("id"), src)
    Graft.write(spark.range(100, 103).toDF("id"), dst)
    GraftTable.forPath(spark, src).redirectTo(dst,
      Seq(NoRedirectRule(Some("backfill-job"), Set("WRITE", "DELETE"))))
    withAppName("backfill-job") {
      // WRITE and DELETE are rule-listed: they commit at the SOURCE
      Graft.write(spark.range(5, 7).toDF("id"), src)
      assert(ids(src) === (0L until 7L).toSet)
      GraftTable.forPath(spark, src).delete($"id" === 6L)
      assert(ids(src) === (0L until 6L).toSet)
      // UPDATE is not listed: still frozen
      val e = intercept[UnsupportedOperationException] {
        GraftTable.forPath(spark, src).update($"id" === 0L, Map("id" -> lit(9L)))
      }
      assert(e.getMessage.contains("redirected"), e.getMessage)
    }
    // the destination never saw the exempt app's commits
    assert(ids(dst) === (100L until 103L).toSet)
    // a non-matching app stays redirected and frozen at the source
    val e2 = intercept[UnsupportedOperationException] {
      GraftTable.forPathNoRedirect(spark, src).delete($"id" === 0L)
    }
    assert(e2.getMessage.contains("redirected"), e2.getMessage)
  }

  test("noRedirectRules: an appName-less rule exempts every application") {
    import graft.log.TableRedirect.NoRedirectRule
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 3).toDF("id"), src)
    Graft.write(spark.range(50, 52).toDF("id"), dst)
    // reference TableRedirect.scala:258-263 — appName.forall on an absent
    // name matches any application
    GraftTable.forPath(spark, src).redirectTo(dst,
      Seq(NoRedirectRule(None, Set.empty)))
    assert(ids(src) === (0L until 3L).toSet)
    withAppName("whoever") { assert(ids(src) === (0L until 3L).toSet) }
    // the destination is still reachable directly
    assert(ids(dst) === (50L until 52L).toSet)
  }

  test("skipCheck conf bypasses the commit gate only; routing still follows") {
    // reference DeltaSQLConf.SKIP_REDIRECT_FEATURE: an internal
    // operational escape hatch honored by performRedirectCheck — a
    // repair session may commit at the frozen source, but resolution
    // keeps serving the destination.
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 3).toDF("id"), src)
    Graft.write(spark.range(50, 52).toDF("id"), dst)
    GraftTable.forPath(spark, src).redirectTo(dst)
    // public resolution serves the destination regardless of the conf
    spark.conf.set("spark.graft.redirect.skipCheck", "true")
    try {
      assert(ids(src) === Set(50L, 51L))
      // ... but the RAW handle may now commit at the frozen source
      GraftTable.forPathNoRedirect(spark, src).delete($"id" === 2L)
      assert(GraftTable.forPathNoRedirect(spark, src)
        .toDF.select("id").as[Long].collect().toSet === Set(0L, 1L))
    } finally spark.conf.unset("spark.graft.redirect.skipCheck")
    // conf unset: the freeze is back
    val e = intercept[UnsupportedOperationException] {
      GraftTable.forPathNoRedirect(spark, src).delete($"id" === 0L)
    }
    assert(e.getMessage.contains("redirected"), e.getMessage)
  }

  test("noRedirectRules: raw property JSON round-trips and READY can update rules") {
    import graft.log.TableRedirect
    val src = tmpDir(); val dst = tmpDir()
    Graft.write(spark.range(0, 3).toDF("id"), src)
    Graft.write(spark.range(50, 52).toDF("id"), dst)
    val t = GraftTable.forPath(spark, src)
    // raw ENABLE with rules in the property JSON
    t.upsertProperties(Map(TableRedirect.PROP ->
      s"""{"type":"PathBasedRedirect","state":"ENABLE-REDIRECT-IN-PROGRESS",
          "spec":{"tablePath":"$dst"},
          "noRedirectRules":[{"appName":"aud","allowedOperations":["WRITE"]}]}"""))
    val afterEnable = TableRedirect.get(t.log.update().metadata).get
    assert(afterEnable.noRedirectRules ===
      Seq(TableRedirect.NoRedirectRule(Some("aud"), Set("WRITE"))))
    // raw READY transition updates the rule set (whole-value semantics)
    t.upsertProperties(Map(TableRedirect.PROP ->
      s"""{"type":"PathBasedRedirect","state":"REDIRECT-READY",
          "spec":{"tablePath":"$dst"},
          "noRedirectRules":[{"allowedOperations":["DELETE"]}]}"""))
    val ready = TableRedirect.get(
      GraftTable.forPathNoRedirect(spark, src).log.update().metadata).get
    assert(ready.state === TableRedirect.STATE_READY)
    assert(ready.noRedirectRules ===
      Seq(TableRedirect.NoRedirectRule(None, Set("DELETE"))))
    // the app-less DELETE rule admits a source-side DELETE for anyone...
    assert(ids(src) === (0L until 3L).toSet) // (and exempts resolution)
    GraftTable.forPathNoRedirect(spark, src).delete($"id" === 2L)
    assert(GraftTable.forPathNoRedirect(spark, src)
      .toDF.select("id").as[Long].collect().toSet === Set(0L, 1L))
    // ... but not a WRITE
    val e = intercept[UnsupportedOperationException] {
      Graft.write(spark.range(10, 11).toDF("id"), src)
    }
    assert(e.getMessage.contains("redirected"), e.getMessage)
  }
}
