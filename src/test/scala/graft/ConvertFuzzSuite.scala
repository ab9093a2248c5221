package graft

import java.nio.file.{Files => JFiles, Paths}

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/**
 * Venue-equivalence fuzz for CONVERT FROM DELTA: a randomly generated
 * Delta log — checkpoint base + commit tail with mixed path SPELLINGS
 * (relative, percent-encoded, `/abs`, `file:/abs`, `file:///abs`),
 * removes, re-adds, and inline-DV rewrites — must fold to the IDENTICAL
 * live state through the driver fold and the distributed window fold.
 * The two venues share no reconciliation code, so any replay-rule drift
 * between them (e.g. an uncanonicalized window key) diverges a seed; the
 * generator also tracks its own truth, catching double-divergence.
 * Deterministic per seed: the same log is generated into each venue's
 * dir (spellings embed that dir), and both folds must match the truth.
 * Log-level only: paths are fabricated, state is compared, no data read.
 */
class ConvertFuzzSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def schemaJson: String = mapper.writeValueAsString(
    new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType).json)

  private def metaLine: String =
    s"""{"metaData":{"id":"11111111-2222-3333-4444-555555555555",""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":$schemaJson,"partitionColumns":[],""" +
      """"configuration":{},"createdTime":1700000000000}}"""

  private def protoLine: String =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["deletionVectors"],""" +
      """"writerFeatures":["deletionVectors"]}}"""

  /** One canonical file known by index; `spell` picks an equivalent
    * on-disk spelling of the same path. Each index sticks to ONE family
    * — table-relative (even) or absolute (odd) — matching real writers
    * (a data file is referenced relatively; only external/cloned files
    * are absolute) and the replay rule, which does NOT unify a relative
    * and an absolute reference to the same name. Spelling varies freely
    * WITHIN the family. */
  private def spell(dir: String, i: Int, rng: Random): String = {
    val name = s"part-$i.parquet"
    if (i % 2 == 0) rng.nextInt(2) match {
      case 0 => name
      case _ => s"part%2D$i.parquet" // percent-encoded '-'
    } else rng.nextInt(3) match {
      case 0 => s"$dir/$name"
      case 1 => s"file:$dir/$name"
      case _ => s"file://$dir/$name"
    }
  }

  /** Inline DV descriptor fragment (",deletionVector":{...}}"). */
  private def dvJson(card: Int, rng: Random): String = {
    val bm = new graft.dv.Bitmap64()
    (0 until card).foreach(_ => bm.add(rng.nextInt(1000).toLong))
    val real = bm.cardinality
    val data = graft.dv.Bitmap64.toDeltaPortable(bm)
    val inline = graft.dv.DeltaDvCodec.z85Encode(data)
    s""","deletionVector":{"storageType":"i","pathOrInlineDv":"$inline",""" +
      s""""sizeInBytes":${data.length},"cardinality":$real}"""
  }

  private def addLine(path: String, dv: String): String =
    s"""{"add":{"path":"$path","partitionValues":{},"size":100,""" +
      s""""modificationTime":1700000000000,"dataChange":true$dv}}"""

  private def removeLine(path: String, dv: String): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":1700000000001,""" +
      s""""dataChange":true$dv}}"""

  /** Cardinality a dv json fragment declares (0 for none). */
  private def extractCard(dv: String): Long =
    if (dv.isEmpty) 0L
    else """"cardinality":(\d+)""".r.findFirstMatchIn(dv)
      .map(_.group(1).toLong).getOrElse(0L)

  /** Generate the seed's log into `dir`; returns index -> live dv card. */
  /** Generate the seed's log into `dir`. The FULL log is always computed
    * (deterministic per (dir, seed)); commits above `writeUpTo` are
    * returned instead of written so a caller can play them later — the
    * sync-equivalence test converts a prefix, appends the rest, syncs,
    * and must land on the same state as converting everything. */
  private def generate(dir: String, seed: Int,
      writeUpTo: Long = 6L): (Map[Int, Long], Seq[(Long, Seq[String])]) = {
    val logDir = new java.io.File(dir, "_delta_log"); logDir.mkdirs()
    val rng = new Random(seed)
    val nFiles = 40
    val truth = scala.collection.mutable.Map.empty[Int, Long]
    val curDv = scala.collection.mutable.Map.empty[Int, String]
    val pending = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]

    // checkpoint base at v1: a random subset live, some with DVs
    val baseLines = scala.collection.mutable.ArrayBuffer(protoLine, metaLine)
    (0 until nFiles).foreach { i =>
      if (rng.nextBoolean()) {
        val dv = if (rng.nextInt(3) == 0) dvJson(1 + rng.nextInt(5), rng) else ""
        baseLines += addLine(spell(dir, i, rng), dv)
        curDv(i) = dv
        truth(i) = extractCard(dv)
      }
    }
    import spark.implicits._
    val cpSchema = org.apache.spark.sql.types.DataType.fromDDL(
      """add STRUCT<path: STRING, partitionValues: MAP<STRING,STRING>,
           size: BIGINT, modificationTime: BIGINT, dataChange: BOOLEAN,
           deletionVector: STRUCT<storageType: STRING, pathOrInlineDv: STRING,
             offset: INT, sizeInBytes: INT, cardinality: BIGINT>>,
         remove STRUCT<path: STRING, deletionTimestamp: BIGINT,
           dataChange: BOOLEAN,
           deletionVector: STRUCT<storageType: STRING, pathOrInlineDv: STRING,
             offset: INT, sizeInBytes: INT, cardinality: BIGINT>>,
         metaData STRUCT<id: STRING, format: STRUCT<provider: STRING,
           options: MAP<STRING,STRING>>, schemaString: STRING,
           partitionColumns: ARRAY<STRING>, configuration: MAP<STRING,STRING>,
           createdTime: BIGINT>,
         protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT,
           readerFeatures: ARRAY<STRING>, writerFeatures: ARRAY<STRING>>"""
    ).asInstanceOf[org.apache.spark.sql.types.StructType]
    val scratch = JFiles.createTempDirectory("graft-cfzcp").toString
    spark.read.schema(cpSchema).json(baseLines.toSeq.toDS)
      .coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    JFiles.move(part.toPath,
      new java.io.File(logDir, f"${1L}%020d.checkpoint.parquet").toPath)
    JFiles.writeString(new java.io.File(logDir, "_last_checkpoint").toPath,
      s"""{"version":1,"size":${baseLines.size}}""")

    // commit tail v2..v6: random add / remove / dv-rewrite per file,
    // every reference using a random spelling of the SAME logical path
    (2L to 6L).foreach { v =>
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      (0 until 1 + rng.nextInt(6)).foreach { _ =>
        val i = rng.nextInt(nFiles)
        rng.nextInt(3) match {
          case 0 => // (re-)add, maybe with a fresh DV. A CONFORMING writer
            // changing the file's dvUid must also remove the old uid —
            // replay keys on (path, dvUid), so leaving the old entry
            // active would double the file (same rule as the reference).
            val dv = if (rng.nextInt(3) == 0) dvJson(1 + rng.nextInt(5), rng) else ""
            val old = curDv.get(i)
            lines += addLine(spell(dir, i, rng), dv)
            old.filter(_ != dv).foreach(o =>
              lines += removeLine(spell(dir, i, rng), o))
            curDv(i) = dv
            truth(i) = extractCard(dv)
          case 1 => // remove the CURRENT (path, dvUid) if live
            if (truth.contains(i)) {
              lines += removeLine(spell(dir, i, rng), curDv.getOrElse(i, ""))
              truth.remove(i); curDv.remove(i)
            }
          case 2 => // DV rewrite: add with new DV + remove of the old uid,
            // in either line order (both are legal per the spec)
            if (truth.contains(i)) {
              val dv = dvJson(1 + rng.nextInt(5), rng)
              val old = curDv.getOrElse(i, "")
              val a = addLine(spell(dir, i, rng), dv)
              val r = removeLine(spell(dir, i, rng), old)
              if (rng.nextBoolean()) { lines += a; lines += r }
              else { lines += r; lines += a }
              curDv(i) = dv
              truth(i) = extractCard(dv)
            }
        }
      }
      if (lines.isEmpty) { // keep every version non-empty
        lines += addLine(spell(dir, 0, rng), "")
        curDv(0) = ""; truth(0) = 0L
      }
      if (v <= writeUpTo)
        JFiles.writeString(Paths.get(logDir.toString, f"$v%020d.json"),
          lines.mkString("", "\n", "\n"))
      else pending += ((v, lines.toSeq))
    }
    (truth.toMap, pending.toSeq)
  }

  /** Live state fingerprint: canonical FILE NAME -> dv cardinality (all
    * spellings of part-i reduce to the same name). */
  private def fingerprint(dir: String): Map[String, Long] = {
    val t = GraftTable.forPath(spark, dir)
    t.snapshot.allFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f.path)
      p.getName -> f.dvCardinality.getOrElse(0L)
    }.toMap
  }

  for (seed <- Seq(1, 17, 4242, 20260814))
  test(s"driver and distributed convert folds agree (seed=$seed)") {
    val dirDriver = JFiles.createTempDirectory(s"graft-cfzd$seed").toString
    val dirDist = JFiles.createTempDirectory(s"graft-cfzx$seed").toString
    val (truthA, _) = generate(dirDriver, seed)
    val (truthB, _) = generate(dirDist, seed)
    assert(truthA === truthB, "generator is not deterministic per seed")
    val expected = truthA.map { case (i, c) => s"part-$i.parquet" -> c }

    graft.log.GraftLog.clearCache()
    Graft.convertFromDelta(spark, dirDriver)
    val fpDriver = fingerprint(dirDriver)

    spark.conf.set(
      graft.commands.ConvertFromDeltaCommand.DRIVER_CONVERT_THRESHOLD_CONF, "1")
    try {
      graft.log.GraftLog.clearCache()
      Graft.convertFromDelta(spark, dirDist)
    } finally spark.conf.unset(
      graft.commands.ConvertFromDeltaCommand.DRIVER_CONVERT_THRESHOLD_CONF)
    val fpDist = fingerprint(dirDist)

    assert(fpDriver === fpDist,
      s"seed=$seed: venues diverged\ndriver=$fpDriver\ndist=$fpDist")
    assert(fpDriver === expected,
      s"seed=$seed: fold diverged from generator truth\n" +
        s"got=$fpDriver\nexpected=$expected")
  }

  for (seed <- Seq(3, 777, 20260815))
  test(s"sync(convert(prefix), tail) == convert(full) (seed=$seed)") {
    val dirFull = JFiles.createTempDirectory(s"graft-cfzf$seed").toString
    val dirSync = JFiles.createTempDirectory(s"graft-cfzs$seed").toString
    val (truthA, nothing) = generate(dirFull, seed)
    assert(nothing.isEmpty)
    // same log, but only up to v4 on disk — convert sees the prefix
    val (truthB, pending) = generate(dirSync, seed, writeUpTo = 4L)
    assert(truthA === truthB, "generator is not deterministic per seed")
    assert(pending.map(_._1) === Seq(5L, 6L))
    val expected = truthA.map { case (i, c) => s"part-$i.parquet" -> c }

    graft.log.GraftLog.clearCache()
    Graft.convertFromDelta(spark, dirFull)
    graft.log.GraftLog.clearCache()
    Graft.convertFromDelta(spark, dirSync)
    // the "Delta writer" lands v5 and v6 after the convert; sync folds
    // exactly that window
    pending.foreach { case (v, lines) =>
      JFiles.writeString(
        Paths.get(dirSync, "_delta_log", f"$v%020d.json"),
        lines.mkString("", "\n", "\n"))
    }
    Graft.syncFromDelta(spark, dirSync)
    assert(fingerprint(dirSync) === fingerprint(dirFull),
      s"seed=$seed: sync-of-tail diverged from full convert")
    assert(fingerprint(dirSync) === expected,
      s"seed=$seed: synced state diverged from generator truth")
  }
}
