package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized INSERT … REPLACE ON vs an independent in-memory model:
 * result = (table rows matching NO source row under the condition)
 *          ++ (every source row).
 * Random corpora (duplicate keys, empty/overlapping/disjoint sources),
 * random condition shapes (equi, range, conjunction), DV on/off, and a
 * partitioned variant — the model is plain Scala collection code sharing
 * nothing with the engine path.
 */
class InsertReplaceFuzzSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmpDir(): String = Files.createTempDirectory("graft-irfuzz").toString

  private case class Cond(
      sql: Column,
      model: ((Long, Long), (Long, Long)) => Boolean,
      desc: String)

  private def conds(rnd: Random): Cond = rnd.nextInt(3) match {
    case 0 => Cond(expr("t.k = s.k"),
      (t, s) => t._1 == s._1, "equi-k")
    case 1 => Cond(expr("t.k <= s.k"),
      (t, s) => t._1 <= s._1, "range-k")
    case _ => Cond(expr("t.k = s.k AND t.v < s.v"),
      (t, s) => t._1 == s._1 && t._2 < s._2, "equi-k-lt-v")
  }

  for (seed <- 0 until 10) {
    test(s"replaceOn matches the model (seed=$seed)") {
      val rnd = new Random(seed * 7919 + 13)
      val dv = rnd.nextBoolean()
      val partitioned = rnd.nextBoolean()
      val mapped = rnd.nextBoolean()
      val n = 50 + rnd.nextInt(200)
      val m = rnd.nextInt(40)
      val table = Seq.fill(n)((rnd.nextInt(30).toLong, rnd.nextInt(100).toLong))
      val source = Seq.fill(m)(
        (rnd.nextInt(40).toLong, rnd.nextInt(100).toLong))
      val cond = conds(rnd)

      val dir = tmpDir()
      val conf =
        (if (dv) Map("graft.enableDeletionVectors" -> "true")
         else Map.empty[String, String]) ++
        (if (mapped) Map("graft.columnMapping.mode" -> "name")
         else Map.empty[String, String])
      var df = table.toDF("k", "v")
      if (partitioned)
        df = df.withColumn("p", ($"k" % 3).cast("string"))
      Graft.write(df.repartition(3), dir,
        partitionBy = if (partitioned) Seq("p") else Nil,
        configuration = conf)

      var src = source.toDF("k", "v")
      if (partitioned)
        src = src.withColumn("p", ($"k" % 3).cast("string"))
      // equi conditions route through replaceUsing half the time so the
      // stats-space candidate pruning path fuzzes against the same model
      if (cond.desc == "equi-k" && rnd.nextBoolean())
        GraftTable.forPath(spark, dir).insertReplaceUsing(src, Seq("k"))
      else
        GraftTable.forPath(spark, dir).insertReplaceOn(src, cond.sql)

      val got = Graft.read(spark, dir).select($"k", $"v")
        .as[(Long, Long)].collect().sorted.toSeq
      val expected = (table.filterNot(t =>
        source.exists(s => cond.model(t, s))) ++ source).sorted
      assert(got === expected,
        s"cond=${cond.desc} dv=$dv partitioned=$partitioned " +
          s"mapped=$mapped n=$n m=$m")
    }
  }
}
