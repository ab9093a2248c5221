package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized MERGE fuzz: seeded random clause sets (matched
 * update/delete, not-matched insert, not-matched-by-source
 * update/delete, each with a random condition from a small pool, in
 * random order) applied to random target/source overlaps, checked
 * against an independent Scala model of the reference semantics —
 * first-applicable-clause per row, clause-condition evaluation over
 * (t, s), unmatched rows untouched. Source ids are distinct so no run
 * trips the multi-match ambiguity guard (DmlMatrixSuite pins those).
 */
class MergeFuzzSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft-mgfz").toString

  // row state: (v, w)
  private case class Row2(v: Long, w: Long)

  // condition pool: SQL text + model predicate over (target, source);
  // NMBS conditions see only t, insert conditions only s
  private case class Cond(sql: String,
      eval: (Option[Row2], Option[Row2]) => Boolean)
  private val matchedConds: Seq[Option[Cond]] = Seq(
    None,
    Some(Cond("s.v % 2 = 0", (_, s) => s.get.v % 2 == 0)),
    Some(Cond("t.v % 3 = 0", (t, _) => t.get.v % 3 == 0)),
    Some(Cond("t.w < s.w", (t, s) => t.get.w < s.get.w)))
  private val insertConds: Seq[Option[Cond]] = Seq(
    None,
    Some(Cond("s.v % 2 = 1", (_, s) => s.get.v % 2 == 1)),
    Some(Cond("s.w > 1", (_, s) => s.get.w > 1)))
  private val nmbsConds: Seq[Option[Cond]] = Seq(
    None,
    Some(Cond("t.w % 4 = 1", (t, _) => t.get.w % 4 == 1)),
    Some(Cond("t.v > 60", (t, _) => t.get.v > 60)))

  private sealed trait Clause
  private case class MU(c: Option[Cond], all: Boolean) extends Clause
  private case class MD(c: Option[Cond]) extends Clause
  private case class NI(c: Option[Cond]) extends Clause
  private case class ND(c: Option[Cond]) extends Clause
  private case class NU(c: Option[Cond]) extends Clause

  for (iter <- 0 until 8) test(s"randomized MERGE vs model (seed ${7100 + iter})") {
    import spark.implicits._
    val r = new scala.util.Random(7100 + iter)
    val dir = tmp()
    val target = (0L until 40L).map(i => i -> Row2(i * 3, i % 10)).toMap
    Graft.write(target.toSeq.map { case (i, x) => (i, x.v, x.w) }
      .toDF("id", "v", "w"), dir)
    val srcMap = r.shuffle((20L until 60L).toVector).take(25)
      .map(i => i -> Row2(i * 7 + 1, i % 5)).toMap

    // random clause set: 0-2 matched, 0-1 insert, 0-1 NMBS. Every 4th
    // iteration FORCES zero matched clauses so the insert-only fast path
    // and the nmbs-without-matched composition are always fuzzed (the
    // seeded rolls alone never produce an empty matched list).
    val matched: Seq[Clause] =
      if (iter % 4 == 3) Nil
      else r.shuffle(Seq(
        MU(matchedConds(r.nextInt(matchedConds.size)), all = r.nextBoolean()),
        MD(matchedConds(r.nextInt(matchedConds.size))))).take(r.nextInt(3))
    val inserts: Seq[Clause] =
      if (r.nextBoolean() || matched.isEmpty)
        Seq(NI(insertConds(r.nextInt(insertConds.size))))
      else Nil
    val nmbs: Seq[Clause] = r.nextInt(3) match {
      case 0 => Nil
      case 1 => Seq(ND(nmbsConds(r.nextInt(nmbsConds.size))))
      case 2 => Seq(NU(nmbsConds(r.nextInt(nmbsConds.size))))
    }
    val clauses = matched ++ inserts ++ nmbs

    // drive the builder
    var b = GraftTable.forPath(spark, dir).merge(
      srcMap.toSeq.map { case (i, x) => (i, x.v, x.w) }.toDF("id", "v", "w"),
      expr("t.id = s.id"))
    clauses.foreach {
      case MU(c, all) =>
        val m = c.map(x => b.whenMatched(expr(x.sql))).getOrElse(b.whenMatched())
        b = if (all) m.updateAll()
            else m.update(Map("v" -> expr("s.v + 1000"), "w" -> expr("t.w + 1")))
      case MD(c) =>
        b = c.map(x => b.whenMatched(expr(x.sql))).getOrElse(b.whenMatched()).delete()
      case NI(c) =>
        b = c.map(x => b.whenNotMatched(expr(x.sql))).getOrElse(b.whenNotMatched()).insertAll()
      case ND(c) =>
        b = c.map(x => b.whenNotMatchedBySource(expr(x.sql)))
          .getOrElse(b.whenNotMatchedBySource()).delete()
      case NU(c) =>
        b = c.map(x => b.whenNotMatchedBySource(expr(x.sql)))
          .getOrElse(b.whenNotMatchedBySource())
          .update(Map("w" -> expr("t.w + 100")))
    }
    b.execute()

    // independent model: first applicable clause per row
    val expected = scala.collection.mutable.Map.empty[Long, Row2]
    target.foreach { case (id, t) =>
      srcMap.get(id) match {
        case Some(s) =>
          matched.find {
            case MU(c, _) => c.forall(_.eval(Some(t), Some(s)))
            case MD(c) => c.forall(_.eval(Some(t), Some(s)))
            case _ => false
          } match {
            case Some(MU(_, all)) =>
              expected(id) = if (all) s else Row2(s.v + 1000, t.w + 1)
            case Some(MD(_)) => // deleted
            case _ => expected(id) = t
          }
        case None =>
          nmbs.find {
            case ND(c) => c.forall(_.eval(Some(t), None))
            case NU(c) => c.forall(_.eval(Some(t), None))
            case _ => false
          } match {
            case Some(ND(_)) => // deleted
            case Some(NU(_)) => expected(id) = Row2(t.v, t.w + 100)
            case _ => expected(id) = t
          }
      }
    }
    srcMap.foreach { case (id, s) =>
      if (!target.contains(id)) {
        val applies = inserts.exists {
          case NI(c) => c.forall(_.eval(None, Some(s)))
          case _ => false
        }
        if (applies) expected(id) = s
      }
    }

    val got = Graft.read(spark, dir).select($"id", $"v", $"w")
      .as[(Long, Long, Long)].collect()
      .map { case (i, v, w) => i -> Row2(v, w) }.toMap
    assert(got === expected.toMap,
      s"seed ${7100 + iter} clauses=$clauses")
  }
}
