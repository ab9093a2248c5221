package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Dedup

/**
 * Property-style fuzz over the exact-substring dedup pipeline and
 * semantic dedup: seeded random corpora with planted structure, checked
 * against invariants that must hold for EVERY input (soundness of every
 * flagged span, exact token accounting through dropSpans, planted-dup
 * completeness) rather than a single hand-picked fixture.
 */
class MlFuzzSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Random word from a small vocabulary — repeats are common enough to
    * exercise gram collisions without making everything a duplicate. */
  private def word(r: scala.util.Random): String = s"w${r.nextInt(600)}"

  test("duplicateSpans + dropSpans invariants over 15 random corpora") {
    for (iter <- 0 until 15) {
      val r = new scala.util.Random(1000 + iter)
      val window = 4 + r.nextInt(5) // 4..8
      val nDocs = 12 + r.nextInt(10)
      // random docs + one shared run planted into two random docs
      val planted = Vector.fill(window + 2)(s"P${r.nextInt(50)}_$iter")
      val da = r.nextInt(nDocs)
      val docs = (0 until nDocs).map { i =>
        val base = Vector.fill(window * 2 + r.nextInt(40))(word(r))
        val toks =
          if (i == da || i == (da + 1) % nDocs) {
            val at = r.nextInt(base.size + 1)
            base.take(at) ++ planted ++ base.drop(at)
          } else base
        (i.toLong, toks.mkString(" "))
      }
      val df = docs.toDF("doc_id", "txt")
      val spans = Dedup.duplicateSpans(df, $"doc_id", $"txt", window)
        .collect().map(s => (s.getLong(0), s.getLong(1), s.getLong(2)))
      val tokensOf = docs.map { case (id, t) =>
        id -> t.split("\\s+").toVector }.toMap

      // 1. structural: in-range, length >= window, disjoint per doc
      spans.foreach { case (d, s, e) =>
        assert(s >= 0 && e <= tokensOf(d).size && e - s >= window,
          s"iter $iter: bad span ($d,$s,$e)")
      }
      spans.groupBy(_._1).foreach { case (d, ss) =>
        val sorted = ss.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array((_, _, e1), (_, s2, _)) =>
            assert(e1 <= s2, s"iter $iter: overlapping spans in doc $d")
          case _ =>
        }
      }

      // 2. soundness: every window-gram inside a flagged span occurs >= 2
      //    times corpus-wide (the exact ExactSubstr definition)
      val gramCount = scala.collection.mutable.Map.empty[String, Int]
      tokensOf.values.foreach { tk =>
        tk.sliding(window).filter(_.size == window)
          .foreach(g => gramCount.updateWith(g.mkString(" "))(
            c => Some(c.getOrElse(0) + 1)))
      }
      spans.foreach { case (d, s, e) =>
        val tk = tokensOf(d)
        (s until e - window + 1).foreach { p =>
          val g = tk.slice(p.toInt, p.toInt + window).mkString(" ")
          assert(gramCount(g) >= 2,
            s"iter $iter: unique gram '$g' flagged in doc $d")
        }
      }

      // 3. completeness for the planted run: both carriers flag a span
      //    covering it
      val carriers = Seq(da.toLong, ((da + 1) % nDocs).toLong)
      carriers.foreach { d =>
        val tk = tokensOf(d)
        val at = tk.indexOfSlice(planted)
        assert(at >= 0)
        assert(spans.exists { case (sd, s, e) =>
          sd == d && s <= at && e >= at + planted.size },
          s"iter $iter: planted run not covered in doc $d")
      }

      // 4. dropSpans accounting: kept + dropped == token count, rebuilt
      //    text == tokens minus span ranges, untouched docs verbatim
      val spansDf = spans.toSeq.toDF("doc_id", "span_start", "span_end")
      val dropped = Dedup.dropSpans(df, $"doc_id", $"txt", spansDf)
        .collect().map(row => row.getLong(0) ->
          ((row.getString(1), row.getLong(2), row.getLong(3)))).toMap
      val flagged = spans.map(_._1).toSet
      docs.foreach { case (id, original) =>
        val tk = tokensOf(id)
        val (text, kept, drop) = dropped(id)
        assert(kept + drop === tk.size.toLong, s"iter $iter doc $id counts")
        if (!flagged.contains(id)) {
          assert(text === original && drop === 0L, s"iter $iter doc $id")
        } else {
          val cut = spans.filter(_._1 == id)
            .flatMap { case (_, s, e) => s until e }.toSet
          val expect = tk.zipWithIndex
            .filterNot { case (_, i) => cut(i.toLong) }
            .map(_._1).mkString(" ")
          assert(text === expect, s"iter $iter doc $id rebuilt text")
        }
      }
    }
  }

  test("semanticDedup invariants over 8 random embedding corpora") {
    for (iter <- 0 until 8) {
      val r = new scala.util.Random(7000 + iter)
      val dim = 8 + r.nextInt(8)
      val n = 60 + r.nextInt(60)
      val base = (0 until n).map(i =>
        (i.toLong, Array.fill(dim)(r.nextGaussian().toFloat)))
      val nDup = 5 + r.nextInt(10)
      val dups = r.shuffle((0 until n).toVector).take(nDup).map { o =>
        val (oid, v) = base(o)
        (oid + 100000L, v.map(x => x * (1.0f + r.nextFloat() * 1e-4f)))
      }
      val k = 2 + r.nextInt(5)
      val got = Dedup.semanticDedup((base ++ dups).toDF("id", "emb"),
          $"id", $"emb", k = k, threshold = 0.9999, maxIter = 4)
        .collect().map(row => row.getLong(0) -> row.getBoolean(2)).toMap
      // every row survives with a verdict
      assert(got.size === base.size + dups.size, s"iter $iter")
      // soundness: a flagged id must have a near-parallel partner
      val emb = (base ++ dups).toMap
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
        d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
          math.sqrt(b.map(x => x.toDouble * x).sum))
      }
      got.filter(_._2).keys.foreach { id =>
        assert(emb.exists { case (o, v) =>
          o != id && cos(emb(id), v) >= 0.9999 }, s"iter $iter: $id")
      }
      // completeness: every planted copy flags (it or its original — the
      // family keeps exactly one member, the min id, which is always the
      // original here)
      dups.foreach { case (did, _) =>
        assert(got(did), s"iter $iter: planted $did not flagged")
        // the original is the family's min id and must survive unflagged
        assert(!got(did - 100000L),
          s"iter $iter: original ${did - 100000L} wrongly flagged")
      }
    }
  }
}
