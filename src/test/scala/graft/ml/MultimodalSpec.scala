package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((0L, "x"), (1L, "y"), (2L, "z"), (5L, "w"))
    .toDF("doc_id", "text")

  test("synthetic payloads are deterministic, shaped, and kind-cycled") {
    val m = Multimodal.syntheticMedia(docs).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[String]("kind"),
        r.getAs[Array[Byte]]("bytes")))
    assert(m.map(_._2).toSet === Set("image", "audio", "video"))
    assert(m.forall(_._3.length === Multimodal.Width * Multimodal.Height))
    val again = Multimodal.syntheticMedia(docs).collect()
      .map(r => r.getAs[Array[Byte]]("bytes").toSeq)
    assert(m.map(_._3.toSeq).toSeq === again.toSeq)
  }

  test("decoder rejects payloads shorter than the metadata shape") {
    intercept[IllegalArgumentException] {
      Multimodal.FakeDecoder.decode(Array[Byte](1, 2, 3), 2, 2)
    }
    assert(Multimodal.FakeDecoder.decode(Array[Byte](1, -1, 3, 4), 2, 2)
      === Array(1, 255, 3, 4)) // unsigned interpretation
  }

  test("imageFeatures: mean/min/max/hash agree with a direct computation") {
    val media = Multimodal.syntheticMedia(docs)
    val feats = Multimodal.imageFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_px"), r.getAs[Double]("mean_px"), r.getAs[Long]("px_hash")))
      .toMap
    val raw = media.select("media_id", "bytes").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    raw.foreach { case (id, bytes) =>
      val px = bytes.map(_ & 0xff)
      val (n, mean, h) = feats(id)
      assert(n === 256L)
      assert(mean === math.floor(px.sum.toDouble / 256 * 1e6 + 0.5) / 1e6)
      assert(h === px.foldLeft(0L)((a, p) => (a * 31 + p) % 1000000007L))
    }
  }

  test("resize 16x16 -> 4x4 picks nearest-neighbor sources") {
    val media = Multimodal.syntheticMedia(docs.limit(1))
    val px = media.select("bytes").head().getAs[Array[Byte]](0).map(_ & 0xff)
    val out = Multimodal.resize(media, 4, 4).collect()
      .map(r => ((r.getAs[Long]("y"), r.getAs[Long]("x")), r.getAs[Long]("px"))).toMap
    assert(out.size === 16)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(out((y.toLong, x.toLong)) === px((y * 16 / 4) * 16 + (x * 16 / 4)).toLong)
  }

  test("audioRms windows audio payloads with exact power-of-two math") {
    val media = Multimodal.syntheticMedia(docs)
    val out = Multimodal.audioRms(media, windowSamples = 32).collect()
      .map(r => ((r.getAs[Long]("media_id"), r.getAs[Long]("win_idx")),
        r.getAs[Double]("rms"))).toMap
    // only doc_id 1 is 'audio' (doc_id % 3 == 1) among 0,1,2,5
    assert(out.keys.map(_._1).toSet === Set(1L))
    assert(out.size === 8) // 256 bytes / 32 samples
    val bytes = media.where($"media_id" === 1).select("bytes")
      .head().getAs[Array[Byte]](0)
    val win0 = bytes.take(32).map(b => (b & 0xff).toLong)
    val expect = math.sqrt(win0.map(v => v * v).sum.toDouble / 32)
    assert(out((1L, 0L)) === math.floor(expect * 1e6 + 0.5) / 1e6)
  }

  test("frameSample keeps every stride-th frame of video payloads only") {
    val media = Multimodal.syntheticMedia(docs)
    val out = Multimodal.frameSample(media, 2).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx")))
    // only doc_id 2 and 5 are 'video' (doc_id % 3 == 2)
    assert(out.map(_._1).toSet === Set(2L, 5L))
    assert(out.filter(_._1 == 2L).map(_._2).sorted.toSeq === Seq(0L, 2L))
  }

  test("imagePHash pairs shared-payload images at hamming 0, noise finds none") {
    // groupSize 3 over ids 0..5 → payload groups {0,1,2} and {3,4,5}
    val six = Seq.tabulate(6)(i => (i.toLong, "t")).toDF("doc_id", "text")
    val out = Multimodal.imagePHash(Multimodal.syntheticMediaGrouped(six, 3))
      .select("media_a", "media_b", "hamming")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // identical payloads hash identically; distinct md5 noise payloads
    // land 30 expected bit flips apart — far beyond hamming 3
    assert(out === Seq((0L, 1L, 0L), (0L, 2L, 0L), (1L, 2L, 0L),
      (3L, 4L, 0L), (3L, 5L, 0L), (4L, 5L, 0L)))
  }

  test("imagePHashChain: subset of the pair set, connects payload families") {
    val six = Seq.tabulate(6)(i => (i.toLong, "t")).toDF("doc_id", "text")
    val media = Multimodal.syntheticMediaGrouped(six, 3)
    val full = Multimodal.imagePHash(media).select("media_a", "media_b")
      .as[(Long, Long)].collect().toSet
    val chain = Multimodal.imagePHashChain(media).select("media_a", "media_b")
      .as[(Long, Long)].collect().toSet
    assert(chain.subsetOf(full))
    // chain edges within each identical-payload family: consecutive ids
    // share every band, so {0,1,2} and {3,4,5} each stay one component
    val parent = scala.collection.mutable.Map((0L to 5L).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    chain.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert((0L to 2L).map(find).toSet.size === 1)
    assert((3L to 5L).map(find).toSet.size === 1)
    assert(find(0L) !== find(3L))
  }

  test("sceneCuts: first frame never a cut, deltas match frame means") {
    val media = Multimodal.syntheticMedia(docs)
    val frames = Multimodal.frameSample(media, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val out = Multimodal.sceneCuts(media, threshold = 8.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    out.foreach { case (id, f, delta, isCut) =>
      if (f == 0L) assert(delta === 0.0 && !isCut)
      else {
        val expect = math.round(
          math.abs(frames((id, f)) - frames((id, f - 1))) * 1e6) / 1e6.toDouble
        assert(delta === expect)
        assert(isCut === (delta > 8.0))
      }
    }
  }

  test("audioFingerprint pairs shared payloads, delta bits match direct calc") {
    val six = Seq.tabulate(6)(i => (i.toLong, "t")).toDF("doc_id", "text")
    val media = Multimodal.syntheticMediaGrouped(six, 3, kind = "audio")
    val out = Multimodal.audioFingerprint(media)
      .select("media_a", "media_b", "hamming")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(out === Seq((0L, 1L, 0L), (0L, 2L, 0L), (1L, 2L, 0L),
      (3L, 4L, 0L), (3L, 5L, 0L), (4L, 5L, 0L)))
    // the signature really is the energy-delta bits of the payload
    val bytes = media.where($"media_id" === 0).select("bytes")
      .head().getAs[Array[Byte]](0)
    val ss = bytes.grouped(4)
      .map(_.map(b => { val v = b & 0xff; v.toLong * v }).sum).toArray
    val risingBits = (0 until 60).count(w => ss(w + 1) > ss(w))
    // payload bytes are md5 noise: deltas must be a non-degenerate mix
    assert(risingBits > 10 && risingBits < 50)
  }
}
