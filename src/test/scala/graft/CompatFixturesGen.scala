package graft

import org.apache.spark.sql.functions._

/**
 * One-shot generator for the frozen log-format compatibility fixtures
 * under `src/test/resources/compat` (reference concept:
 * EvolvabilitySuite's committed old-version tables — re-designed). Run
 * with `sbt "Test/runMain graft.CompatFixturesGen"` ONLY when
 * intentionally refreshing the corpus; [[CompatSuite]] cold-reads the
 * committed artifacts forever, so an accidental serialization change
 * fails CI instead of silently orphaning every existing table.
 */
object CompatFixturesGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/test/resources/compat")
    val spark = TestSpark.spark
    import spark.implicits._

    // Frozen fixtures stay frozen: an existing dir is SKIPPED (its block
    // below must not run), never overwritten — delete one first only when
    // intentionally regenerating it.
    def ifFresh(name: String)(gen: String => Unit): Unit = {
      val d = new java.io.File(out, name)
      if (d.exists) println(s"compat fixture $name exists — left frozen")
      else gen(d.toString)
    }

    // 1. basic: append + delete-rewrite + append, classic checkpoint + crc
    ifFresh("basic") { basic =>
      Graft.write(spark.range(100).select($"id", ($"id" % 7).as("k"))
        .repartition(1), basic,
        configuration = Map("graft.checkpointInterval" -> "2"))
      GraftTable.forPath(spark, basic).delete(expr("id % 10 = 0"))
      Graft.write(spark.range(100, 120).select($"id", ($"id" % 7).as("k"))
        .repartition(1), basic)
    }

    // 2. v2cp: v2 sidecar-bucketed checkpoint policy
    ifFresh("v2cp") { v2 =>
      Graft.write(spark.range(50).toDF("id").repartition(1), v2,
        configuration = Map(
          "graft.checkpointPolicy" -> "v2",
          "graft.checkpointNumSidecars" -> "4",
          "graft.checkpointInterval" -> "2"))
      Graft.write(spark.range(50, 80).toDF("id").repartition(1), v2)
      Graft.write(spark.range(80, 90).toDF("id").repartition(1), v2)
    }

    // 3. dv: deletion vectors + change data feed
    ifFresh("dv") { dv =>
      Graft.write(spark.range(60).select($"id", ($"id" * 2).as("v"))
        .repartition(1), dv,
        configuration = Map(
          "graft.enableDeletionVectors" -> "true",
          "graft.enableChangeDataFeed" -> "true"))
      GraftTable.forPath(spark, dv).delete($"id" < 15)
    }

    // 4. mapped: column mapping (name mode) + rename + column DEFAULT
    ifFresh("mapped") { mapped =>
      Graft.create(spark, mapped, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        graft.schema.ColumnDefaults.defaultField("src",
          org.apache.spark.sql.types.StringType, "'web'"))),
        configuration = Map("graft.columnMapping.mode" -> "name"))
      Graft.write(spark.range(40).toDF("id"), mapped)
      GraftTable.forPath(spark, mapped).renameColumn("src", "origin")
      Graft.write(spark.range(40, 50).select($"id", lit("api").as("origin")),
        mapped)
    }

    // 5. mhidx: incremental MinHash-LSH index table pair (banding
    //    parameters live in table properties; buckets partitioned by band)
    ifFresh("mhidx") { mhidx =>
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog again and again today"),
        (2L, "an entirely different document all about spark and scala programming"))
        .toDF("doc_id", "text")
      graft.ml.Dedup.buildMinHashIndex(corpus, $"doc_id", $"text", mhidx,
        numHashes = 64, bands = 16, shingleSize = 3)
      graft.ml.Dedup.dedupAgainstIndex(
        Seq((10L, "completely novel text zz yy xx ww vv uu tt ss rr qq pp oo"))
          .toDF("doc_id", "text"),
        $"doc_id", $"text", mhidx,
        numHashes = 64, bands = 16, shingleSize = 3, updateIndex = true).count()
    }

    // 6. mirrored: delta-format mirror enabled — _delta_log alongside
    //    _graft_log, shared data files, mirror checkpoint at v10
    ifFresh("mirrored") { mirrored =>
      Graft.write(spark.range(30).toDF("id").repartition(1), mirrored,
        configuration = Map(graft.commands.DeltaMirror.PROP -> "delta"))
      (0 until 10).foreach { i =>
        Graft.write(spark.range(30 + i * 5L, 35 + i * 5L).toDF("id")
          .repartition(1), mirrored)
      }
    }

    // 7. bloom: frozen decontaminateBloom output over CompatSuite's
    //    literal corpus — pins the shingle hash function AND the bloom
    //    bit-indexing math (word/bit layout, k derivation); any drift
    //    makes the recomputed hits disagree with the frozen rows
    ifFresh("bloom") { bloom =>
      val (train, bench) = CompatSuite.bloomCorpus(spark)
      graft.ml.Dedup.decontaminateBloom(train, bench,
          $"doc_id", $"text", n = 3, fpp = 0.01)
        .coalesce(1).write.parquet(bloom)
    }

    // 8. packing: frozen packSequences assignment over CompatSuite's
    //    deterministic token counts — pins the bucketed prefix-sum
    //    boundaries (seq_id / doc_offset / seq_offset / n_tokens per doc)
    ifFresh("packing") { packing =>
      graft.ml.Curation.packSequences(CompatSuite.packingCorpus(spark),
          $"doc_id", $"n_tokens", seqLen = 128, buckets = 8)
        .coalesce(1).write.parquet(packing)
    }

    println(s"compat fixtures written under $out")
    spark.stop()
  }
}
