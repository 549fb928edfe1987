package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Dedup, TextStats}

/** Unicode NFC normalization, the domain-level quality gate, and
  * temperature mixture weights.
  */
class CurationOpsSpec extends AnyFunSuite {

  test("NFC: decomposed accents compose, counts are codepoints, ASCII is untouched") {
    val spark = TestSpark.spark
    import spark.implicits._
    val raw = Seq(
      (1L, "café"), // e + combining acute -> é
      (2L, "Zürich"), // u + combining diaeresis -> ü
      (3L, "plain ascii"),
      (4L, "Å") // A + combining ring -> Å
    ).toDF("doc_id", "raw")
    val out = TextStats.nfcNormalize(raw).orderBy("doc_id").collect()
    assert(out(0).getString(2) == "café" && out(0).getBoolean(4))
    assert(out(0).getInt(1) == 5 && out(0).getInt(3) == 4, "codepoint counts")
    assert(out(1).getString(2) == "Zürich" && out(1).getBoolean(4))
    assert(out(2).getString(2) == "plain ascii" && !out(2).getBoolean(4))
    assert(out(3).getString(2) == "Å" && out(3).getInt(3) == 1)
    // idempotence: NFC of NFC output changes nothing
    val again = TextStats.nfcNormalize(
      TextStats.nfcNormalize(raw).select(col("doc_id"), col("text_nfc").as("raw")))
      .collect()
    assert(again.forall(!_.getBoolean(4)), "NFC must be idempotent")
  }

  test("nfcPlant: suffix selection is a pure function of doc_id, 3 of 4 branches decompose") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = (1L to 40L).map(i => (i, s"doc $i", "en", "src", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val planted = TextStats.nfcPlant(d)
    val out = TextStats.nfcNormalize(planted).collect()
    assert(out.exists(_.getBoolean(4)) && out.exists(!_.getBoolean(4)),
      "the md5 coin must plant both changed and unchanged docs")
    // re-running plants the identical suffixes (no randomness)
    val out2 = TextStats.nfcNormalize(TextStats.nfcPlant(d)).collect()
    assert(out.map(_.toSeq).toSet == out2.map(_.toSeq).toSet)
  }

  private def gateCorpus = {
    val spark = TestSpark.spark
    import spark.implicits._
    // > 50 tokens so the length factor saturates and quality clears the floor
    val good = Iterator.continually("the cat is on a mat and the dog is of the house")
      .take(6).mkString(" ")
    val bad = "!!!! ???? %%%% ####"
    ((1L to 8L).map(i => (i, good, "en", "clean", good.length.toLong)) ++
      (9L to 16L).map(i => (i, bad, "en", "spam", bad.length.toLong)))
      .toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("source gate: a spam-heavy source drops wholesale, a clean one survives") {
    val g = Corpus.sourceQualityGate(gateCorpus).orderBy("source").collect()
    assert(g.length == 2)
    val byName = g.map(r => r.getString(0) -> r).toMap
    assert(byName("clean").getBoolean(5), "clean source must keep")
    assert(!byName("spam").getBoolean(5), "spam source must drop")
    assert(byName("spam").getLong(2) == 8L, "all spam docs are sub-threshold")
    val kept = Corpus.sourceFiltered(gateCorpus).collect()
    assert(kept.length == 8 && kept.forall(_.getString(1) == "clean"),
      "filtered corpus is exactly the surviving source's docs")
  }

  test("temperature weights: weight ∝ sqrt(n_source), exact for perfect squares") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = ((1L to 16L).map(i => (i, "t", "big")) ++ (17L to 20L).map(i => (i, "t", "small")))
      .toSeq.toDF("doc_id", "text", "source")
    val w = Corpus.temperatureWeights(d).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w("big") == 4000000L && w("small") == 2000000L,
      s"sqrt(16)=4, sqrt(4)=2 in micro units: $w")
    // damping: proportional sampling would weight big 4x small; T=2 halves the ratio
    assert(w("big") / w("small") == 2L)
  }

  test("v3 funnel: bad_source outranks per-doc legs; high_perplexity fires past quality") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 40-word shared vocabulary (5 stopwords in the mix); each clean
    // doc is a deterministic LCG shuffle of it repeated to 60 words —
    // shared vocab keeps stored-LM counts dense (low perplexity) while
    // distinct orders keep shingle Jaccard low (no near-dup clusters).
    val stop = Vector("the", "is", "of", "and", "a")
    val vocab = stop ++ (0 until 35).map(i => s"w$i")
    def cleanText(seed: Int): String = {
      // xor-then-multiply mixing: 40 elements are too few for a plain
      // LCG to decorrelate permutations across seeds (additive seed
      // terms preserve relative order)
      val order = vocab.indices.sortBy { j =>
        (((j * 2654435761L) ^ (seed * 0x9E3779B9L)) * 2654435761L) & 0x7fffffffL
      }
      // exactly one period of the vocabulary: repeating it would plant
      // a 20-gram self-duplicate and trip the span leg
      order.map(vocab(_)).mkString(" ")
    }
    val cleanDocs = (1L to 12L).map(i => (i, cleanText(i.toInt), "en", "clean"))
    val weird = (20L, (0 until 60).map(i => s"novel$i").mkString(" "), "en", "clean")
    val farmJunk = (31L to 38L).map(i => (i, "!!!! ???? %%%% ####", "en", "farm"))
    val farmGood = (40L, cleanText(40), "en", "farm")
    val docs = (cleanDocs :+ weird) ++ farmJunk :+ farmGood
    val ddf = docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    // benchmark vec 0 orthogonal to every doc vector: no semantic leg
    val emb = ((0L, Seq(1.0f, 0.0f), 0) +: docs.map(d => (d._1, Seq(0.0f, 1.0f), 1)))
      .toDF("vec_id", "embedding", "label")

    val (bi, uni, v) = TextStats.lmCounts(
      ddf.filter(col("source") === "clean" && col("doc_id") <= 12))
    val biM = bi.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val uniM = uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vN = v.collect().head.getLong(0)
    // fixture sanity: clean docs price under the ceiling, the novel doc above
    val ppl = TextStats.lmScoreStored(ddf, biM, uniM, vN).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(ppl(1L) < Corpus.LmPplMax, s"clean doc must price under the ceiling: ${ppl(1L)}")
    assert(ppl(20L) >= Corpus.LmPplMax, s"novel doc must price over the ceiling: ${ppl(20L)}")

    val out = Corpus.docPipelineFullV3(ddf, emb, biM, uniM, vN).collect()
      .map(r => r.getLong(0) -> r).toMap
    def reason(id: Long) = out(id).getString(out(id).fieldIndex("reason"))
    assert(reason(1L) == "keep", s"clean formulaic doc keeps: ${reason(1L)}")
    assert(reason(20L) == "high_perplexity",
      "novel-transition doc passes quality (0.5) but fails the LM read")
    assert(reason(40L) == "bad_source",
      "an individually-good page on a junk farm drops at the DOMAIN level")
    assert(reason(31L) == "bad_source",
      "domain verdict outranks too_short for the junk pages themselves")
    graft.operators.CacheScope.releaseAll()
  }

  test("v4 funnel: a non-target-language doc passing every other gate drops with wrong_language") {
    val spark = TestSpark.spark
    import spark.implicits._
    // clean English docs (keep), plus one GERMAN doc engineered to
    // pass every other gate: 60 words, dense German markers (the
    // langId battery predicts 'de'), no punctuation, vocabulary shared
    // with the LM training set so perplexity stays under the ceiling
    val stop = Vector("the", "is", "of", "and", "a")
    val vocab = stop ++ (0 until 35).map(i => s"w$i")
    def cleanText(seed: Int): String = {
      val order = vocab.indices.sortBy { j =>
        (((j * 2654435761L) ^ (seed * 0x9E3779B9L)) * 2654435761L) & 0x7fffffffL
      }
      order.map(vocab(_)).mkString(" ")
    }
    val cleanDocs = (1L to 12L).map(i => (i, cleanText(i.toInt), "en", "clean"))
    // the German doc reuses the shared vocab (familiar bigrams) but
    // leads with enough 'der die und ist das' mass to win the langId
    // vote over the English stopwords in the tail
    val german = (50L,
      (0 until 6).map(_ => "der die und ist das").mkString(" ") + " " + cleanText(50),
      "de", "clean")
    val docs = cleanDocs :+ german
    val ddf = docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val emb = ((0L, Seq(1.0f, 0.0f), 0) +: docs.map(d => (d._1, Seq(0.0f, 1.0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val (bi, uni, v) = TextStats.lmCounts(ddf)
    val biM = bi.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val uniM = uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vN = v.collect().head.getLong(0)

    // fixture sanity: the German doc passes every OTHER gate
    val ppl = TextStats.lmScoreStored(ddf, biM, uniM, vN).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(ppl(50L) < Corpus.LmPplMax, s"german doc must price under the LM ceiling: ${ppl(50L)}")
    val pred = TextStats.langId(ddf).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("predicted"))).toMap
    assert(pred(50L) == "de" && pred(1L) == "en", s"langId fixture drifted: $pred")

    val out = Corpus.docPipelineFullV4(ddf, emb, biM, uniM, vN).collect()
      .map(r => r.getLong(0) -> r).toMap
    def reason(id: Long) = out(id).getString(out(id).fieldIndex("reason"))
    assert(reason(1L) == "keep", s"clean english doc keeps: ${reason(1L)}")
    assert(reason(50L) == "wrong_language",
      s"the german doc passes every other gate and must drop at the language gate: ${reason(50L)}")
    // parameterization: with 'de' in the target set the same doc keeps
    val outDe = Corpus.docPipelineFullV4(ddf, emb, biM, uniM, vN, Set("en", "de"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(outDe(50L).getString(outDe(50L).fieldIndex("reason")) == "keep",
      "widening the target set must keep the german doc")
    graft.operators.CacheScope.releaseAll()
  }

  test("pipelineExport: verdict → sharded parquet + manifest + card; only kept docs ship") {
    val spark = TestSpark.spark
    import spark.implicits._
    val stop = Vector("the", "is", "of", "and", "a")
    val vocab = stop ++ (0 until 35).map(i => s"w$i")
    def cleanText(seed: Int): String = {
      val order = vocab.indices.sortBy { j =>
        (((j * 2654435761L) ^ (seed * 0x9E3779B9L)) * 2654435761L) & 0x7fffffffL
      }
      order.map(vocab(_)).mkString(" ")
    }
    val cleanDocs = (1L to 12L).map(i => (i, cleanText(i.toInt), "en", "clean"))
    val german = (50L,
      (0 until 6).map(_ => "der die und ist das").mkString(" ") + " " + cleanText(50),
      "de", "clean")
    val docs = cleanDocs :+ german
    val ddf = docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val emb = ((0L, Seq(1.0f, 0.0f), 0) +: docs.map(d => (d._1, Seq(0.0f, 1.0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val (bi, uni, v) = TextStats.lmCounts(ddf)
    val biM = bi.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val uniM = uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vN = v.collect().head.getLong(0)

    val verdict = Corpus.docPipelineFullV4(ddf, emb, biM, uniM, vN).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    val keptIds = verdict.filter(_._2).keySet
    assert(keptIds.nonEmpty && !verdict(50L), "fixture: german doc must drop")
    graft.operators.CacheScope.releaseAll()

    val path = java.nio.file.Files.createTempDirectory("export_spec_").toString
    Corpus.pipelineExport(ddf, emb, biM, uniM, vN, path)

    // the release layout exists: shard directories, manifest, card
    val dataDir = new java.io.File(s"$path/data")
    val shardDirs = dataDir.listFiles().filter(_.getName.startsWith("shard=")).map(_.getName)
    assert(shardDirs.nonEmpty, s"sharded layout missing: ${dataDir.listFiles().toSeq}")
    // the written data holds EXACTLY the kept docs, with their text
    val written = spark.read.parquet(s"$path/data")
    val writtenIds = written.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(writtenIds == keptIds, s"exported ids $writtenIds != kept $keptIds")
    assert(!writtenIds.contains(50L), "a dropped doc must not ship")
    assert(written.columns.contains("text") && written.columns.contains("n_tokens"))
    // shard assignment is the deterministic coin
    val coins = written.select(col("doc_id"), col("shard").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    coins.foreach { case (id, sh) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shard$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(sh == java.lang.Long.parseLong(hex.substring(0, 8), 16) % Corpus.ExportShards,
        s"doc $id landed in the wrong shard")
    }
    // the stored manifest agrees with a recount from the files
    val stored = spark.read.parquet(s"$path/manifest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val recount = Corpus.exportManifestFromFiles(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == recount, "manifest must agree with the written files")
    // the card summarizes the KEPT corpus
    val card = spark.read.parquet(s"$path/card").collect()
    assert(card.length == 1 && card(0).getLong(0) == keptIds.size.toLong,
      s"card must count the kept corpus: ${card.toSeq}")
    graft.operators.CacheScope.releaseAll()
  }

  test("pipelineExport ships the next ingest's dedup bases: exported ≡ freshly-written probes") {
    val spark = TestSpark.spark
    import spark.implicits._
    def words(tag: String) = (0 until 12).map(w => s"$tag$w").mkString(" ")
    val stop = Vector("the", "is", "of", "and", "a")
    val vocab = stop ++ (0 until 35).map(i => s"w$i")
    def cleanText(seed: Int): String = {
      val order = vocab.indices.sortBy { j =>
        (((j * 2654435761L) ^ (seed * 0x9E3779B9L)) * 2654435761L) & 0x7fffffffL
      }
      order.map(vocab(_)).mkString(" ")
    }
    val ddf = (1L to 10L).map(i => (i, cleanText(i.toInt), "en", "clean"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val emb = ((0L, Seq(1.0f, 0.0f), 0) +: (1L to 10L).map(i => (i, Seq(0.0f, 1.0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val (bi, uni, v) = TextStats.lmCounts(ddf)
    val biM = bi.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val uniM = uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vN = v.collect().head.getLong(0)
    val t = "export_bases_spec"
    val tables = Seq(s"${t}_fp", s"${t}_nd", s"${t}_fresh_fp", s"${t}_fresh_nd")
    def dropAll(): Unit = tables.foreach { b =>
      (spark.sql(s"SHOW TABLES LIKE '$b*'").select("tableName")
        .collect().map(_.getString(0)))
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
    dropAll()
    try {
      val path = java.nio.file.Files.createTempDirectory("export_bases_").toString
      Corpus.pipelineExport(ddf, emb, biM, uniM, vN, path, basesTable = Some(t))
      // fresh bases written directly from the exported data — the
      // release artifact itself feeds the comparison, not the input
      val shipped = spark.read.parquet(s"$path/data").select("doc_id", "text")
      graft.sinks.Sinks.writeDedupBase(shipped, s"${t}_fresh_fp")
      graft.sinks.Sinks.writeNearDupBase(shipped, s"${t}_fresh_nd")
      // a next-release batch: one recrawl of a kept doc, one near-copy,
      // one novel doc
      val keptOne = shipped.orderBy("doc_id").collect().head
      val batch = Seq(
        (900L, keptOne.getString(1)),
        (901L, keptOne.getString(1) + " extra"),
        (902L, words("z"))).toDF("doc_id", "text")
      val vExp = Dedup.incrementalDedupStored(spark, s"${t}_fp", batch)
        .collect().map(_.toSeq).toSet
      val vFresh = Dedup.incrementalDedupStored(spark, s"${t}_fresh_fp", batch)
        .collect().map(_.toSeq).toSet
      assert(vExp === vFresh, "exported exact base diverged from a fresh write")
      assert(vExp.nonEmpty)
      val pExp = Dedup.nearDupAgainstStored(spark, s"${t}_nd", batch)
        .collect().map(_.toSeq).toSet
      val pFresh = Dedup.nearDupAgainstStored(spark, s"${t}_fresh_nd", batch)
        .collect().map(_.toSeq).toSet
      assert(pExp === pFresh, "exported near-dup base diverged from a fresh write")
      assert(pExp.exists(r => r.head == 900L), "the recrawl must near-dup the base")
      graft.operators.CacheScope.releaseAll()
    } finally dropAll()
  }

  /** Clean-doc corpus + clustered vectors for the ANN-export pins:
    * ids 1..30 have documents, vec_id 0 has a vector but NO document —
    * a correct export must not serve it.
    */
  private def annExportFixture() = {
    val spark = TestSpark.spark
    import spark.implicits._
    val stop = Vector("the", "is", "of", "and", "a")
    val vocab = stop ++ (0 until 35).map(i => s"w$i")
    def cleanText(seed: Int): String = {
      val order = vocab.indices.sortBy { j =>
        (((j * 2654435761L) ^ (seed * 0x9E3779B9L)) * 2654435761L) & 0x7fffffffL
      }
      order.map(vocab(_)).mkString(" ")
    }
    val ddf = (1L to 30L).map(i => (i, cleanText(i.toInt), "en", "clean"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val rnd = new scala.util.Random(77)
    val centers = Array.fill(4, 64)(rnd.nextGaussian().toFloat)
    val emb = (0 to 30).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.15f * rnd.nextGaussian().toFloat).toSeq, (i % 4).toLong)
    }.toDF("vec_id", "embedding", "label")
    val (bi, uni, v) = TextStats.lmCounts(ddf)
    val biM = bi.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val uniM = uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vN = v.collect().head.getLong(0)
    (ddf, emb, biM, uniM, vN)
  }

  test("pipelineExport ships the kept corpus's ANN serving index: exported ≡ fresh, kept ids only") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (ddf, emb, biM, uniM, vN) = annExportFixture()
    val path = java.nio.file.Files.createTempDirectory("export_ann_").toString
    Corpus.pipelineExport(ddf, emb, biM, uniM, vN, path, basesTable = None,
      annIndex = Corpus.AnnIndexIvf)
    val shippedIds = spark.read.parquet(s"$path/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shippedIds.nonEmpty && !shippedIds.contains(0L))
    // the exported index serves exactly what a fresh write over the
    // shipped corpus's vectors serves
    val keptVecs = emb
      .join(shippedIds.toSeq.toDF("vec_id"), "vec_id")
      .select("vec_id", "embedding")
    val fresh = java.nio.file.Files.createTempDirectory("export_ann_fresh_").toString
    graft.sinks.Sinks.writeAnnIndex(keptVecs, fresh)
    val queries = keptVecs.orderBy("vec_id").limit(3)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val got = graft.sinks.Sinks.readAnnIndexTopK(spark, s"$path/ann_index", queries)
      .collect().map(_.toSeq).toSet
    val want = graft.sinks.Sinks.readAnnIndexTopK(spark, fresh, queries)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got === want,
      "the exported ANN index diverged from a fresh write over the shipped corpus")
    // the codes table carries kept ids ONLY — the droppable doc and the
    // documentless vector must be absent from the release artifact
    val codeIds = spark.read.parquet(s"$path/ann_index/codes")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(codeIds === shippedIds,
      s"index ids must equal the shipped corpus: extra=${codeIds -- shippedIds} missing=${shippedIds -- codeIds}")
    graft.operators.CacheScope.releaseAll()
  }

  test("pipelineExport ships the HNSW serving index: frozen search ≡ fresh write, kept ids only") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (ddf, emb, biM, uniM, vN) = annExportFixture()
    val path = java.nio.file.Files.createTempDirectory("export_hnsw_").toString
    Corpus.pipelineExport(ddf, emb, biM, uniM, vN, path, basesTable = None,
      annIndex = Corpus.AnnIndexHnsw)
    val shippedIds = spark.read.parquet(s"$path/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shippedIds.nonEmpty && !shippedIds.contains(0L))
    // the graph kind must not ship the IVF artifact
    assert(!new java.io.File(s"$path/ann_index").exists(),
      "AnnIndexHnsw must not write the IVF layout")
    val keptVecs = emb
      .join(shippedIds.toSeq.toDF("vec_id"), "vec_id")
      .select("vec_id", "embedding")
    val fresh = java.nio.file.Files.createTempDirectory("export_hnsw_fresh_").toString
    graft.sinks.Sinks.writeHnswIndex(keptVecs, fresh)
    val queries = keptVecs.orderBy("vec_id").limit(3)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val got = graft.sinks.Sinks.readHnswIndexTopK(spark, s"$path/ann_index_hnsw", queries)
      .collect().map(_.toSeq).toSet
    val want = graft.sinks.Sinks.readHnswIndexTopK(spark, fresh, queries)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got === want,
      "the exported HNSW index diverged from a fresh write over the shipped corpus")
    // vectors artifact carries kept ids ONLY
    val gen = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/ann_index_hnsw/CURRENT")), "UTF-8").trim
    val vecIds = spark.read.parquet(s"$path/ann_index_hnsw/g$gen/vectors")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(vecIds === shippedIds,
      s"index ids must equal the shipped corpus: extra=${vecIds -- shippedIds} missing=${shippedIds -- vecIds}")
    graft.operators.CacheScope.releaseAll()
  }

  test("pipelineExport retires a prior export's serving indexes on re-run: no stale index beside fresh shards") {
    val spark = TestSpark.spark
    val (ddf, emb, biM, uniM, vN) = annExportFixture()
    val path = java.nio.file.Files.createTempDirectory("export_stale_").toString
    Corpus.pipelineExport(ddf, emb, biM, uniM, vN, path, basesTable = None,
      annIndex = Corpus.AnnIndexBoth)
    assert(new java.io.File(s"$path/ann_index").exists())
    assert(new java.io.File(s"$path/ann_index_hnsw").exists())
    // re-run WITHOUT indexes: both prior artifacts must be retired, so
    // a consumer can never silently search the previous release
    Corpus.pipelineExport(ddf, emb, biM, uniM, vN, path, basesTable = None,
      annIndex = Corpus.AnnIndexNone)
    assert(!new java.io.File(s"$path/ann_index").exists(),
      "a re-run without annIndex left the prior IVF index beside fresh shards")
    assert(!new java.io.File(s"$path/ann_index_hnsw").exists(),
      "a re-run without annIndex left the prior HNSW index beside fresh shards")
    graft.operators.CacheScope.releaseAll()
  }

  test("pipelineExport: a compute-only failure preserves the previous release, index included") {
    val spark = TestSpark.spark
    val (ddf, emb, biM, uniM, vN) = annExportFixture()
    val path = java.nio.file.Files.createTempDirectory("export_computefail_").toString
    Corpus.pipelineExport(ddf, emb, biM, uniM, vN, path, basesTable = None,
      annIndex = Corpus.AnnIndexIvf)
    val dataBefore = spark.read.parquet(s"$path/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(new java.io.File(s"$path/ann_index").exists())
    // a funnel that cannot compute (schema-broken input) must fail
    // BEFORE the index retire: the previous release keeps serving —
    // data shards AND index — because this run never got to the point
    // of replacing anything
    intercept[Exception] {
      Corpus.pipelineExport(ddf.drop("text"), emb, biM, uniM, vN, path,
        basesTable = None, annIndex = Corpus.AnnIndexIvf)
    }
    assert(new java.io.File(s"$path/ann_index").exists(),
      "a compute-only failure must not retire the previous release's index")
    val dataAfter = spark.read.parquet(s"$path/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dataAfter === dataBefore,
      "a compute-only failure must leave the previous data shards intact")
    graft.operators.CacheScope.releaseAll()
  }

  test("temperature mixture: quotas follow sqrt weights through the integer quota machinery") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = ((1L to 90L).map(i => (i, "x", "big")) ++ (91L to 100L).map(i => (i, "x", "small")))
      .toSeq.toDF("doc_id", "text", "source")
    val out = Corpus.mixtureSampleTemperature(d)
    val quotas = out.select("source", "k_src", "n_src").distinct().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // k_src never exceeds the source's population and the weight ratio is ~3 (sqrt(90/10))
    quotas.foreach { case (_, (k, n)) => assert(k <= n) }
    val kBig = quotas("big")._1.toDouble
    val kSmall = quotas("small")._1.toDouble
    assert(kBig / kSmall >= 2.5 && kBig / kSmall <= 3.5,
      s"T=2 quota ratio must track sqrt(90)/sqrt(10) ~= 3: $kBig / $kSmall")
  }
}
