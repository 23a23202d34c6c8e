package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.sources.Tables

/** Pins the REAL codec path (q227/q228) the way the oracle can't:
  *
  *  - decode determinism: the PNG encode is byte-identical run to run
  *    (the q227 hash check would survive a nondeterministic-but-lossless
  *    encoder; a cache key or content-addressed store would not);
  *  - decoded samples == the synthGray ground truth, pixel by pixel —
  *    the raster-level form of what the q227 oracle proves statistically;
  *  - the planted-recall THEOREM: a uniform intensity shift leaves every
  *    blockSum·totalPix > totalSum·blockPix comparison invariant, so
  *    same-family docs share the exact 64-bit hash and q228's band join
  *    recovers EVERY within-family pair — asserted against the brute
  *    pair list, not sampled.
  */
class PngCodecSpec extends SparkSpec {
  import Multimodal.{PngRecord, synthDims, synthGray}

  private def docs = Tables.documents(spark, sf()).select(col("doc_id"))

  test("PNG encode is deterministic: two runs, byte-identical payloads") {
    def run(): Map[Long, Seq[Byte]] =
      Multimodal.encodePng(docs).collect()
        .map(r => r.doc_id -> r.png.toSeq).toMap
    val (a, b) = (run(), run())
    assert(a.keySet == b.keySet && a.keySet.nonEmpty)
    a.foreach { case (id, bytes) =>
      assert(bytes == b(id), s"doc $id: PNG bytes differ between runs")
    }
  }

  test("decoded raster samples equal the synthGray ground truth") {
    javax.imageio.ImageIO.setUseCache(false)
    Multimodal.encodePng(docs.limit(64)).collect().foreach { rec =>
      val (cl, sh, w, h) = synthDims(rec.doc_id)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(rec.png))
      assert(img.getWidth == w && img.getHeight == h,
        s"doc ${rec.doc_id}: dims ${img.getWidth}x${img.getHeight} != ${w}x$h")
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(raster.getSample(x, y, 0) == synthGray(cl, sh, x, y),
          s"doc ${rec.doc_id}: pixel ($x,$y) decoded != ground truth")
    }
  }

  test("WAV encode is deterministic and decode recovers the exact waveform") {
    val recs = Multimodal.encodeWav(docs.limit(64)).collect()
    val again = Multimodal.encodeWav(docs.limit(64)).collect()
      .map(r => r.doc_id -> r.wav.toSeq).toMap
    recs.foreach { rec =>
      assert(rec.wav.toSeq == again(rec.doc_id),
        s"doc ${rec.doc_id}: WAV bytes differ between runs")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(rec.wav))
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      assert(n == Multimodal.synthWavLen(rec.doc_id),
        s"doc ${rec.doc_id}: $n samples decoded")
      for (i <- 0 until n) {
        val s = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i).toInt & 0xff)
        assert(s == Multimodal.synthSample(rec.doc_id, i),
          s"doc ${rec.doc_id}: sample $i decoded != ground truth")
      }
    }
  }

  test("video container: stride-1 decode equals formula for every frame; stride-2 samples exactly the even frames") {
    import Multimodal.{synthFrameCount, synthFrameGray, FrameW, FrameH}
    val vids = Multimodal.encodeVideo(docs.limit(32))
    val all = Multimodal.sampleFrames(vids, stride = 1).collect()
    all.foreach { fs =>
      val truth = (for (y <- 0 until FrameH; x <- 0 until FrameW)
        yield synthFrameGray(fs.doc_id, fs.frame_idx, x, y).toLong).sum
      assert(fs.frame_sum == truth,
        s"doc ${fs.doc_id} frame ${fs.frame_idx}: decoded sum != truth")
    }
    val byDoc = all.groupBy(_.doc_id)
    byDoc.foreach { case (id, fss) =>
      assert(fss.length == synthFrameCount(id), s"doc $id: frame count")
    }
    val sampled = Multimodal.sampleFrames(Multimodal.encodeVideo(docs.limit(32)), stride = 2)
      .collect().groupBy(_.doc_id)
    sampled.foreach { case (id, fss) =>
      assert(fss.map(_.frame_idx).sorted.toSeq ==
        (0 until synthFrameCount(id) by 2).toSeq,
        s"doc $id: sampled frame indices")
    }
  }

  test("uniform-shift invariance: same-family docs share the exact hash; q228 recovers every planted pair") {
    import spark.implicits._
    val stats = Multimodal.decodePngStats(Multimodal.encodePng(docs)).collect()
    // the theorem: bands are a function of the family alone
    stats.groupBy(s => s.doc_id / 16).foreach { case (fam, ss) =>
      val distinct = ss.map(_.bands.toSeq).distinct
      assert(distinct.size == 1,
        s"family $fam: ${distinct.size} distinct hashes — shift invariance broken")
    }
    // recall: every within-family pair survives the band join + L1 verify
    val planted = (for {
      a <- stats; b <- stats
      if a.doc_id < b.doc_id && a.doc_id / 16 == b.doc_id / 16
    } yield (a.doc_id, b.doc_id)).toSet
    val got = graft.queries.QueryCatalog.queries("q228_png_neardup")(spark, sf())
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(planted.nonEmpty, "fixture too small to plant any pair")
    assert((planted -- got).isEmpty,
      s"planted pairs missed: ${(planted -- got).take(5)}")
  }
}
