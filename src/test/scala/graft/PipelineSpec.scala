package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.Multimodal
import graft.streaming.EventsStream

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("multimodal decode: sha identity + stub features, via mapPartitions") {
    val docs = Seq((1L, "hello world", "en", "src0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.decode(spark, Multimodal.asMedia(spark, docs)).collect()
    assert(out.length == 1)
    val d = out.head
    assert(d.n_bytes == 11L)
    assert(d.width == 11L % 1024 && d.height == (11L * 7) % 768)
    assert(d.content_sha == "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
    assert(d.mime == "application/x-en")
  }

  private def ev(id: Long, minute: Int, typ: String, v: Double) =
    Ev(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), 1L, typ, v)

  test("multimodal resize + frame-sample stubs preserve identity and geometry") {
    val docs = Seq((1L, "x" * 300, "en", "src0", 300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.asMedia(spark, docs)
    val decoded = Multimodal.decode(spark, media)

    // decode stub: width = 300 % 1024 = 300, height = 2100 % 768 = 564
    // resize fits the 564-px side into 224: scale 224/564
    val resized = Multimodal.resizeStub(spark, decoded).collect().head
    assert(resized.width == 300L * 224 / 564 && resized.height == 224L)
    assert(resized.scale_num == 224L && resized.scale_den == 564L)

    val frames = Multimodal.frameSampleStub(spark, media).collect()
    // 300 bytes, 64-byte frames, stride 128 -> offsets 0,128 => 2 frames
    assert(frames.map(_.offset).sorted.toSeq == Seq(0L, 128L))
    // identical windows of identical content hash identically
    assert(frames.map(_.frame_sha).distinct.length == 1)
  }

  test("file-source streaming pipeline runs on real testdata (nanos ts handled)") {
    // file streams need a directory; stage the single-file table into one
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val out = EventsStream.pipeline(spark, dir)
    val sq = out.writeStream.format("memory").queryName("pipe_out").outputMode("complete").start()
    try {
      sq.processAllAvailable()
      val n = spark.table("pipe_out").count()
      assert(n > 0)
      // must agree with the batch path over the same files
      val batch = EventsStream.windowedAgg(
        Tables(spark, "/root/testdata/sf0.001", "events")).count()
      assert(n == batch)
    } finally sq.stop()
  }

  test("streaming windowed agg matches the batch transform") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(ev(1, 5, "click", 1.0), ev(2, 15, "click", 2.0),
      ev(3, 45, "view", 3.0), ev(4, 59, "click", 4.0))

    val stream = MemoryStream[Ev]
    stream.addData(events)
    val sq = EventsStream.windowedAgg(stream.toDF(), watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("agg_out").outputMode("complete").start()
    try {
      sq.processAllAvailable()
      val streamed = spark.table("agg_out")
        .select("window_start", "event_type", "n", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batch = EventsStream.windowedAgg(events.toDF())
        .select("window_start", "event_type", "n", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(batch.exists { case (_, t, n, s) => t == "click" && n == 3 && s == 7.0 })
    } finally sq.stop()
  }

  test("SignalFeatureModel: real content features, batched, deterministic") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull).limit(64)
    val media = Multimodal.asMedia(spark, docs)
    val model = new Multimodal.SignalFeatureModel
    val a = Multimodal.embedWith(spark, media, model, batchSize = 7).collect()
      .map(e => e.media_id -> e.embedding.toSeq).toMap
    val b = Multimodal.embedWith(spark, media, model, batchSize = 64).collect()
      .map(e => e.media_id -> e.embedding.toSeq).toMap
    assert(a == b, "batch size must not change results")
    assert(a.nonEmpty)
    a.values.foreach { v =>
      assert(v.length == 32)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"not unit-norm: $norm")
    }
    // different content -> different features (not a constant map)
    assert(a.values.toSet.size > 1)
    // near-dup content -> near vectors: a doc vs itself with one appended
    // byte should stay close in cosine while random pairs spread
    val bytes = docs.limit(1).select("text").collect()(0).getString(0).getBytes("UTF-8")
    val Seq(v1, v2) = model.embedBatch(Seq((0L, bytes), (1L, bytes :+ 'x'.toByte)))
      .map(_.map(_.toDouble))
    val cos = v1.zip(v2).map { case (x, y) => x * y }.sum
    assert(cos > 0.99, s"near-dup cosine $cos")
  }

  test("IntMlpEmbedModel: a real forward pass — exactness bound, batching, zero-input algebra") {
    // B11e: the fixed-weight MLP arm. The oracle hash-gates the full
    // forward pass; this pins the model contract — batch-size
    // independence, Float exactness (every output integer-valued and far
    // below 2^24), and the zero-input algebra h = max(b1,0)/64,
    // y = W2·h + b2 recomputed here from the md5 weight derivation.
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
    val media = Multimodal.asMedia(spark, docs)
    val model = new Multimodal.IntMlpEmbedModel
    val a = Multimodal.embedWith(spark, media, model, batchSize = 7).collect()
      .map(e => e.media_id -> e.embedding.toSeq).toMap
    val b = Multimodal.embedWith(spark, media, model, batchSize = 64).collect()
      .map(e => e.media_id -> e.embedding.toSeq).toMap
    assert(a == b, "batch size must not change results")
    assert(a.nonEmpty && a.values.forall(_.length == 16))
    a.values.flatten.foreach { y =>
      assert(y == math.rint(y) && math.abs(y) < (1 << 24).toFloat,
        s"output $y must be an exactly-representable integer")
    }
    assert(a.values.toSet.size > 1, "not a constant map")
    // zero input (empty blob): the network reduces to pure bias algebra
    def w(tag: String): Long = (graft.operators.Lsh.md5Hash60(tag) % 17L) - 8L
    val h0 = (0 until 16).map(k => math.max(w(s"b1_$k"), 0L) / 64L)
    val y0 = (0 until 16).map(d =>
      (0 until 16).map(k => w(s"w2_${d}_$k") * h0(k)).sum + w(s"b2_$d"))
    val got = model.embedBatch(Seq((0L, Array.emptyByteArray))).head
    assert(got.toSeq == y0.map(_.toFloat), "zero-input forward pass algebra")
  }

  test("ckpt arm: training replays independently, checkpoint round-trips, restore validates") {
    // B11f: the LEARNED readout. The oracle hash-gates training + forward
    // pass + search; this pins (a) the trainer against an independent
    // functional-style perceptron replay, (b) stored ≡ restored weights
    // (the weights-as-data round-trip), (c) loud layout refusals.
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8"), r.getString(2)))
      .sortBy(_._1)
    val samples = docs.filter(_._1 < 256L)
      .map { case (id, b, lang) => (id, Multimodal.IntMlp.readoutFeatures(b), lang) }.toSeq
    val (classes, w) = Multimodal.trainPerceptronReadout(samples, epochs = 2)
    assert(classes == classes.sorted && classes.size >= 2)
    // independent replay: immutable fold, margin from pre-update state
    val refW = (0 until 2).foldLeft(
      classes.map(c => c -> Vector.fill(17)(0L)).toMap) { (st0, _) =>
      samples.foldLeft(st0) { case (st, (_, g, lang)) =>
        classes.foldLeft(st) { (s2, c) =>
          val y = if (lang == c) 1L else -1L
          val wc = s2(c)
          val margin = y * ((0 until 16).map(i => wc(i) * g(i)).sum + wc(16))
          if (margin <= 0L)
            s2.updated(c, Vector.tabulate(17)(i =>
              wc(i) + y * (if (i < 16) g(i) else 1L)))
          else s2
        }
      }
    }
    classes.zipWithIndex.foreach { case (c, ci) =>
      assert(w(ci).toSeq == refW(c), s"trained weights for class $c diverge")
    }
    assert(w.exists(_.exists(_ != 0L)), "training must actually update (mistakes exist)")
    // checkpoint round-trip: stored ≡ restored, bit for bit
    val path = graft.TmpDirs.path("nn_ckpt_spec")
    Multimodal.writeCheckpoint(spark, path, classes, w)
    val (rc, rw) = Multimodal.restoreCheckpoint(spark, path)
    assert(rc == classes && rw.map(_.toSeq).toSeq == w.map(_.toSeq).toSeq)
    // foreign layouts refused loudly BEFORE serving garbage
    import spark.implicits._
    val gap = graft.TmpDirs.wiped("nn_ckpt_spec_gap")
    spark.read.parquet(path).filter("NOT (out_idx = 0 AND in_idx = 3)")
      .write.parquet(gap)
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.restoreCheckpoint(spark, gap)
    }
    assert(e1.getMessage.contains("different layout"))
    val skipCls = graft.TmpDirs.wiped("nn_ckpt_spec_skip")
    spark.read.parquet(path).filter("out_idx <> 1").write.parquet(skipCls)
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.restoreCheckpoint(spark, skipCls)
    }
    assert(e2.getMessage.contains("not contiguous"))
    // the trainer refuses an out-of-order sample sequence (the update is
    // order-sensitive; the oracle replays ascending-id order)
    val e3 = intercept[IllegalArgumentException] {
      Multimodal.trainPerceptronReadout(samples.reverse, epochs = 1)
    }
    assert(e3.getMessage.contains("ascending"))

    // the entry: all results lang=en, and the top-10 equals a brute-force
    // replay over the learned logits computed here from the spec's weights
    val entry = SparkEntry.queries("multimodal_search_ckpt")(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(entry.size == 10)
    def logits(b: Array[Byte]): Array[Long] = {
      val g = Multimodal.IntMlp.readoutFeatures(b)
      Array.tabulate(classes.size)(c =>
        (0 until 16).map(i => w(c)(i) * g(i)).sum + w(c)(16))
    }
    val q = logits(docs.find(_._1 == 5L).get._2)
    val ref = docs.filter(_._3 == "en").map { case (id, b, _) =>
      val y = logits(b)
      (id, y.zip(q).map { case (a2, b2) => val d = a2 - b2; d * d }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(10).toSeq
    assert(entry == ref, s"entry $entry != brute-force replay $ref")
  }

  test("EmbedModels.forSession dispatches ONNX vs signal-featurizer both ways") {
    import Multimodal.EmbedModels
    // no model path configured → featurizer, regardless of runtime
    spark.conf.unset(EmbedModels.OnnxModelPathConf)
    assert(EmbedModels.forSession(spark, () => true)
      .isInstanceOf[Multimodal.SignalFeatureModel])
    try {
      spark.conf.set(EmbedModels.OnnxModelPathConf, "/models/resnet50.onnx")
      spark.conf.set(EmbedModels.OnnxDimsConf, "2048")
      // path + runtime present → the ONNX model (construction must not
      // touch the runtime; only embedBatch binds, lazily)
      val m = EmbedModels.forSession(spark, () => true)
      assert(m.isInstanceOf[Multimodal.OnnxEmbedModel])
      assert(m.dims == 2048)
      // path set but runtime ABSENT → degrade to the featurizer, not a crash
      assert(EmbedModels.forSession(spark, () => false)
        .isInstanceOf[Multimodal.SignalFeatureModel])
      // this container genuinely has no ai.onnxruntime on the classpath:
      // the default probe must say so, and a direct embedBatch call must
      // fail LOUDLY with the dispatch hint rather than deep in reflection
      assert(!EmbedModels.onnxRuntimeAvailable())
      val err = intercept[IllegalStateException] {
        m.asInstanceOf[Multimodal.OnnxEmbedModel].embedBatch(Seq((0L, Array[Byte](1, 2))))
      }
      // the failure must name the missing runtime PRECISELY (r8 verdict
      // stretch #8): the artifact coordinate, the dispatch fix, and the
      // underlying linkage error as the cause — not a bare reflection trace
      assert(err.getMessage.contains("ai.onnxruntime"), err.getMessage)
      assert(err.getMessage.contains("forSession"), err.getMessage)
      assert(err.getCause.isInstanceOf[ClassNotFoundException] ||
        err.getCause.isInstanceOf[NoClassDefFoundError], s"cause: ${err.getCause}")
    } finally {
      spark.conf.unset(EmbedModels.OnnxModelPathConf)
      spark.conf.unset(EmbedModels.OnnxDimsConf)
    }
  }
}
