package graft

import org.apache.spark.sql.functions._
import graft.operators.{LangId, Multimodal}

class MultimodalLangIdSpec extends SparkTestBase {
  import spark.implicits._

  test("asset pipeline: schema, determinism, features") {
    val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sf))
    // compare names+types (nullability differs: `when/otherwise` infers non-null)
    assert(assets.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.assetSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val f1 = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(f1.length == 500)
    assert(f1.map(_.digest).toSeq == f2.map(_.digest).toSeq) // deterministic stub
    assert(f1.forall(_.embedding.length == Multimodal.FakeDecoder.dim))
    // n_bytes matches payload length (ascii text fixture)
    val chars = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f1.forall(f => f.n_bytes == chars(f.asset_id)))
  }

  test("resize stub: deterministic, updates metadata, bounded payload") {
    val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sf))
    val r1 = Multimodal.resize(assets, 64, 48).collect().sortBy(_.asset_id)
    val r2 = Multimodal.resize(assets, 64, 48).collect().sortBy(_.asset_id)
    assert(r1.map(_.bytes.toSeq).toSeq == r2.map(_.bytes.toSeq).toSeq)
    assert(r1.forall(a => a.meta_width == 64 && a.meta_height == 48))
    assert(r1.forall(_.bytes.length <= 64 * 48 / 64))
  }

  test("real imageio decode: rendered PNG round-trips true dimensions through resize") {
    // a real PNG decodes to its true size
    val png = Multimodal.renderPng(10, 7, seed = 99L)
    val direct = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(direct.getWidth == 10 && direct.getHeight == 7)
    // distributed path: image kinds get real PNGs, decode reports TRUE
    // source dims, output re-decodes at the target dims
    val assets = Multimodal.withRenderedImages(
      Multimodal.assetsFromDocuments(Tables.documents(spark, sf)))
    val resized = Multimodal.resizeImages(assets, 4, 3).collect().sortBy(_.asset_id)
    val images = resized.filter(_.kind == "image")
    assert(images.nonEmpty)
    images.foreach { r =>
      assert(r.decoded, s"asset ${r.asset_id} should have decoded")
      assert(r.orig_width == (r.asset_id % 64 + 8).toInt &&
        r.orig_height == (r.asset_id % 48 + 8).toInt,
        s"asset ${r.asset_id}: wrong decoded dims ${r.orig_width}x${r.orig_height}")
      val out = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
      assert(out.getWidth == 4 && out.getHeight == 3)
    }
    // non-image payloads (text bytes) fall back to the stub, flagged as such
    val others = resized.filter(_.kind != "image")
    assert(others.nonEmpty && others.forall(r => !r.decoded && r.orig_width == -1))
  }

  test("frame sampling expands video assets by stride") {
    val df = Seq((1L, 10), (2L, 3)).toDF("asset_id", "n_frames")
    val out = Multimodal.sampleFrameIndices(df, "n_frames", stride = 2, maxFrames = 100)
      .groupBy("asset_id").agg(collect_list("frame_idx").as("idx"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(1L) == Seq(0, 2, 4, 6, 8))
    assert(out(2L) == Seq(0, 2))
  }

  test("langid: separable synthetic languages classify correctly") {
    val aa = (1 to 40).map(_ => "alpha beta gamma delta").mkString(" ")
    val bb = (1 to 40).map(_ => "zulu yankee xray whiskey").mkString(" ")
    val train = Seq((1L, aa, "A"), (2L, bb, "B"), (3L, aa + " beta", "A"), (4L, bb + " zulu", "B"))
      .toDF("doc_id", "text", "lang")
    val profile = LangId.train(train, col("text"), col("lang"), topM = 50)
    val test_ = Seq((10L, "alpha gamma delta beta alpha"), (11L, "whiskey zulu xray yankee"))
      .toDF("doc_id", "text")
    val pred = LangId.predict(test_, col("text"), col("doc_id"), profile)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(10L) == "A")
    assert(pred(11L) == "B")
  }

  test("langid held-out accuracy: train/test hash-split, classify unseen docs") {
    import graft.operators.Sampling
    // synthetic corpus with real per-language signal (the parquet fixture
    // draws text from one shared vocabulary for every lang label, so
    // held-out accuracy there measures noise, not the classifier):
    // 3 languages, disjoint-ish vocabularies, seeded pseudo-random docs
    val vocab = Map(
      "A" -> Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta"),
      "B" -> Vector("zulu", "yankee", "xray", "whiskey", "victor", "uniform"),
      "C" -> Vector("ichi", "nii", "san", "yon", "go", "roku"))
    val rnd = new scala.util.Random(7)
    val docs = (0 until 300).map { i =>
      val lang = Seq("A", "B", "C")(i % 3)
      val words = (0 until 30).map(_ => vocab(lang)(rnd.nextInt(6)))
      (i.toLong, words.mkString(" "), lang)
    }.toDF("doc_id", "text", "lang")
    // the engine's own deterministic splitter drives the train/test flow
    val split = docs.withColumn("split",
      Sampling.splitColumn(col("doc_id"), Seq("train" -> 0.8, "test" -> 0.2)))
    val trainDocs = split.filter(col("split") === "train")
    val testDocs = split.filter(col("split") === "test")
    assert(trainDocs.count() > 0 && testDocs.count() > 0)
    val profile = LangId.train(trainDocs, col("text"), col("lang"), topM = 100)
    val pred = LangId.predictCompiled(testDocs, col("text"), col("doc_id"), profile)
    val graded = testDocs.select(col("doc_id"), col("lang"))
      .join(pred, "doc_id")
    val n = graded.count()
    val correct = graded.filter(col("lang") === col("pred_lang")).count()
    assert(n == testDocs.count(), "every held-out doc must get a prediction")
    assert(correct.toDouble / n >= 0.95,
      s"held-out accuracy $correct/$n below floor on separable languages")
  }

  test("langid on the fixture returns a prediction for every doc") {
    val docs = Tables.documents(spark, sf)
    val profile = LangId.train(docs, col("text"), col("lang"))
    val pred = LangId.predict(docs, col("text"), col("doc_id"), profile)
    assert(pred.count() == docs.count())
    assert(pred.filter(col("pred_lang").isNull).count() == 0)
  }

  test("predictCompiled (external profile) == relational predict on the fixture") {
    val docs = Tables.documents(spark, sf)
    val profile = LangId.train(docs, col("text"), col("lang"))
    val a = LangId.predictCompiled(docs, col("text"), col("doc_id"), profile)
    val b = LangId.predict(docs, col("text"), col("doc_id"), profile)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("langid train-once/classify-many: profile persists to parquet and back") {
    // the SCALE.md "persisted artifact" path: train writes a tiny parquet
    // model; any later job loads it and classifies with zero training cost
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("langid_model").toString
    try {
      LangId.train(docs, col("text"), col("lang")).write
        .mode("overwrite").parquet(dir)
      val loaded = spark.read.parquet(dir)
      val a = LangId.predictCompiled(docs, col("text"), col("doc_id"), loaded)
      val b = LangId.predictCompiled(docs, col("text"), col("doc_id"),
        LangId.train(docs, col("text"), col("lang")))
      assert(a.except(b).isEmpty && b.except(a).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("broadcast-literal langid scoring == relational form on the fixture") {
    val docs = Tables.documents(spark, sf)
    val a = LangId.selfLabelPredict(docs, col("text"), col("doc_id"), col("lang"))
    val b = LangId.selfLabelPredictRelational(docs, col("text"), col("doc_id"), col("lang"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // the scoring stage itself is a zero-shuffle projection
    val nEx = "Exchange".r.findAllIn(a.queryExecution.executedPlan.toString).size
    assert(nEx == 0, s"scoring stage should not shuffle:\n${a.queryExecution.executedPlan}")
  }

  test("integer-quantized (oracle-gated) langid == the kernel primary on the fixture") {
    // the ≤5e-7 weight quantization must not flip a single argmax here —
    // if it ever does, the gated row and the primary have genuinely
    // diverged and both need a look
    val docs = Tables.documents(spark, sf)
    val a = LangId.selfLabelPredict(docs, col("text"), col("doc_id"), col("lang"))
    val c = LangId.selfLabelPredictExact(docs, col("text"), col("doc_id"), col("lang"))
    assert(a.except(c).isEmpty && c.except(a).isEmpty)
  }

  test("aHash: identical bytes equal, distinct renders distinct, junk is None; dedup groups exact (round 9)") {
    import graft.operators.Multimodal
    val a = Multimodal.renderPng(24, 24, seed = 7L)
    val b = Multimodal.renderPng(24, 24, seed = 7L)
    val c = Multimodal.renderPng(24, 24, seed = 8L)
    assert(Multimodal.aHash(a).isDefined)
    assert(Multimodal.aHash(a) === Multimodal.aHash(b))
    assert(Multimodal.aHash(a) !== Multimodal.aHash(c))
    assert(Multimodal.aHash("not a png".getBytes).isEmpty)
    // planted classes: ids 0..9 rendered from seed id % 3 → 3 dup groups
    val assets = (0L to 9L).map(i => Multimodal.Asset(i, "image",
      Multimodal.renderPng(16, 16, i % 3), 16, 16)).toDS()
    val groups = Multimodal.perceptualDedup(assets)
      .orderBy("keep_id").as[(Long, Long)].collect().toSeq
    assert(groups === Seq((0L, 4L), (1L, 3L), (2L, 3L)), groups.toString)
  }

  test("pHash: identical bytes equal, distinct renders distinct, junk None; differs from aHash; groups exact") {
    import graft.operators.Multimodal
    val a = Multimodal.renderPng(24, 24, seed = 7L)
    val b = Multimodal.renderPng(24, 24, seed = 7L)
    val c = Multimodal.renderPng(24, 24, seed = 8L)
    assert(Multimodal.pHash(a).isDefined)
    assert(Multimodal.pHash(a) === Multimodal.pHash(b))
    assert(Multimodal.pHash(a) !== Multimodal.pHash(c))
    assert(Multimodal.pHash("not a png".getBytes).isEmpty)
    // a DIFFERENT family: the spectral hash is not the pixel-mean hash
    assert(Multimodal.pHash(a) !== Multimodal.aHash(a))
    // same planted-class group structure through the parameterized dedup
    val assets = (0L to 9L).map(i => Multimodal.Asset(i, "image",
      Multimodal.renderPng(16, 16, i % 3), 16, 16)).toDS()
    val groups = Multimodal.perceptualDedupBy(assets, Multimodal.pHash)
      .orderBy("keep_id").as[(Long, Long)].collect().toSeq
    assert(groups === Seq((0L, 4L), (1L, 3L), (2L, 3L)), groups.toString)
  }
}
