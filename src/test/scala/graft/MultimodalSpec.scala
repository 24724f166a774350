package graft

import graft.pipeline.Multimodal
import graft.synth.Synth
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Image-pipeline operators over the BASELINE.json input_hint table. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("banded phash LSH finds exactly the brute-force pairs at hamming ≤ 7") {
    // deterministic synthetic hashes: base values + controlled bit flips
    val rng = new Synth.Rng(7L)
    val base = (0 until 40).map(i => (f"id-$i%03d", rng.nextLong()))
    val flipped = base.take(10).zipWithIndex.map { case ((id, h), i) =>
      // flip i%9 bits spread across bands → hamming 0..8 vs the base row
      val flips = (0 until i % 9).map(b => 1L << ((b * 13 + i) % 64))
      (id + "-dup", flips.foldLeft(h)(_ ^ _))
    }
    val df = (base ++ flipped).toDF("image_id", "phash")
    val got = Multimodal.phashNearDupPairs(df, 7)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    val rows = (base ++ flipped)
    val want = (for {
      (a, ha) <- rows; (b, hb) <- rows
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 7
    } yield (a, b)).toSet
    assert(got == want)
  }

  test("fidelity gate: clean copy passes; pixel/caption corruption caught") {
    val imgs = Synth.images(spark, 18).toDF()
    assert(Multimodal.fidelityProblems(imgs, imgs).isEmpty)

    val badPixels = imgs.withColumn("bytes",
      Multimodal.corruptPixelsUdf(col("bytes"), col("fmt")))
    val pixelFails = Multimodal.fidelityProblems(imgs, badPixels)
    assert(pixelFails.count() == 18)
    assert(pixelFails.where(col("caption_ok")).count() == 18)

    val badCaption = imgs.withColumn("caption", concat(col("caption"), lit("!")))
    val capFails = Multimodal.fidelityProblems(imgs, badCaption)
    assert(capFails.count() == 18)
    assert(capFails.where(!col("caption_ok")).count() == 18)
  }

  test("jpeg encode holds the 40 dB PSNR gate; lossless round-trips exactly") {
    val rows = (0 until 9).map(i => Synth.makeImage(42L, i))
    rows.foreach { r =>
      val img = Multimodal.decode(r.bytes).get
      assert(img.getWidth == r.w && img.getHeight == r.h)
      if (r.fmt == "jpeg") {
        // re-encode of the DECODED pixels vs those pixels stays ≥ 40 dB
        val re = Multimodal.decode(Multimodal.encode(img, "jpeg")).get
        assert(Multimodal.psnr(img, re) >= 40.0, s"${r.image_id}")
      } else {
        val re = Multimodal.decode(Multimodal.encode(img, r.fmt)).get
        assert(Multimodal.psnr(img, re).isPosInfinity, s"${r.image_id}")
      }
    }
  }

  test("resized copy keeps a near-identical phash (scale invariance)") {
    val rows = (0 until 12).map(i => Synth.makeImage(42L, i))
    rows.foreach { r =>
      val img = Multimodal.decode(r.bytes).get
      val small = Multimodal.resize(img, 24, 24)
      assert(Multimodal.hamming64(Multimodal.phash64(img), Multimodal.phash64(small)) <= 4)
    }
  }

  test("wavFeatures recovers exact synthesis parameters on the square-wave corpus") {
    (0L until 20L).foreach { i =>
      val r = Synth.makeWav(i)
      val f = Multimodal.wavFeatures(r.bytes)
      assert(f.contains((r.sample_rate, r.channels, 16, r.frames.toLong, r.amp, r.amp)),
        s"wav $i: got $f, row $r")
    }
  }

  test("wavFeatures handles the big-endian (AIFF) branch and rejects non-audio") {
    // transcode a synthesized little-endian WAV to AIFF (PCM16 big-endian)
    // through javax itself — features must be identical
    val r = Synth.makeWav(3L)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(r.bytes))
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    assert(Multimodal.wavFeatures(out.toByteArray)
      .contains((r.sample_rate, r.channels, 16, r.frames.toLong, r.amp, r.amp)))
    // non-audio / null / truncated-header inputs → None, never a throw
    assert(Multimodal.wavFeatures(null).isEmpty)
    assert(Multimodal.wavFeatures(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.wavFeatures("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.wavFeatures(Synth.makeImage(42L, 1).bytes).isEmpty)
  }

  test("wavFeatures silence and zero-frame edge cases") {
    val silent = Multimodal.encodeWavPcm16(8000, 1, Array.fill[Short](100)(0))
    assert(Multimodal.wavFeatures(silent).contains((8000, 1, 16, 100L, 0, 0)))
    val empty = Multimodal.encodeWavPcm16(44100, 2, Array.empty[Short])
    assert(Multimodal.wavFeatures(empty).contains((44100, 2, 16, 0L, 0, 0)))
  }
}
