package graft.synth

import graft.core.{Digests, Field, HeaderSerde, ImageRow, RobotsRule, WarcRecord}
import graft.pipeline.Multimodal
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import java.awt.image.BufferedImage
import java.sql.Timestamp

/** Deterministic fixture synthesizer (FIXTURES.md; no wall-clock, no
  * unseeded randomness, no external data). Mirrors the reference's test
  * strategy: a seeded generator whose output is checked for exact offsets
  * and zero verify problems (/root/reference/tests/warc_generator.rs:41-81,
  * tests/test_decode.rs:77-78,122-125).
  */
object Synth {

  /** splitmix64 — tiny, stable, well-distributed. */
  final class Rng(seed0: Long) {
    private var state = seed0
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = ((nextLong() >>> 1) % bound).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  private val Words = Vector("table", "scan", "merge", "row", "batch", "key",
    "value", "spark", "crawl", "frontier", "image", "caption", "fetch", "host")

  // ------------------------------------------------------------------
  // 1. images — the graft input table (BASELINE.json input_hint shape)
  // ------------------------------------------------------------------

  def makeImage(seed: Long, i: Long): ImageRow = {
    val rng = new Rng(seed * 1000003L + i)
    val w = 16 + rng.nextInt(48)
    val h = 16 + rng.nextInt(48)
    val fmt = Vector("png", "bmp", "jpeg")((i % 3).toInt)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // per-image orientation + phase so structure (and phash) differs across
    // images, while staying smooth enough that JPEG holds the 40 dB gate
    val flipX = rng.nextInt(2) == 1
    val flipY = rng.nextInt(2) == 1
    val ox = rng.nextInt(256); val oy = rng.nextInt(256)
    // triangular ramp: continuous (no 255→0 wrap edge JPEG would ring on)
    def tri(v: Int): Int = { val m = v % 510; if (m < 255) m else 510 - m }
    val lossless = fmt != "jpeg"
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val gx = if (flipX) 255 - x * 255 / w else x * 255 / w
        val gy = if (flipY) 255 - y * 255 / h else y * 255 / h
        val r = tri(gx + ox)
        val g = tri(gy + oy)
        val b = (r + g) / 2
        val noise = if (lossless) (rng.nextInt(16) - 8) & 0x07 else 0
        img.setRGB(x, y, ((r << 16) | (g << 8) | b) ^ noise)
        x += 1
      }
      y += 1
    }
    val bytes = Multimodal.encode(img, fmt)
    val caption = s"caption $i " +
      (0 until (3 + rng.nextInt(5))).map(_ => Words(rng.nextInt(Words.size))).mkString(" ")
    ImageRow(f"img-$i%08d", bytes, w, h, fmt, caption,
      Multimodal.phash64(Multimodal.decode(bytes).get))
  }

  def images(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(i => makeImage(seed, i)))
  }

  final case class WavRow(audio_id: String, bytes: Array[Byte],
                          sample_rate: Int, channels: Int, frames: Int,
                          amp: Int)

  /** Deterministic WAV corpus: PCM16 square wave at amplitude `amp` —
    * every sample is ±amp, so the decoded RMS and peak both equal `amp`
    * EXACTLY (the mean-square sum is exact in double for these sizes),
    * letting the DuckDB oracle re-derive every extracted feature from
    * row-index arithmetic alone.
    */
  def makeWav(i: Long): WavRow = {
    val rate = Vector(8000, 16000, 22050, 44100)((i % 4).toInt)
    val ch = 1 + (i % 2).toInt
    val frames = 400 + (i % 5).toInt * 200
    val amp = 1000 + (i % 7).toInt * 500
    val samples = new Array[Short](frames * ch)
    var j = 0
    while (j < samples.length) {
      samples(j) = (if ((j / ch) % 2 == 0) amp else -amp).toShort
      j += 1
    }
    WavRow(f"wav-$i%08d", Multimodal.encodeWavPcm16(rate, ch, samples),
      rate, ch, frames, amp)
  }

  def wavs(spark: SparkSession, n: Int): Dataset[WavRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(i => makeWav(i)))
  }

  final case class AviRow(video_id: String, bytes: Array[Byte],
                          w: Int, h: Int, rate: Int, n_frames: Int)

  /** Deterministic AVI corpus: uncompressed-DIB clips of SOLID-COLOR
    * frames — frame f of clip i is filled with
    * (r,g,b) = ((7i+13f)%256, (11i+17f)%256, (5i+19f)%256), so every
    * per-frame channel statistic the demuxer extracts is exact
    * row-index arithmetic the DuckDB oracle re-derives. Width cycles
    * through non-multiples of 4 (15/24/33/42) so the DIB 4-byte row
    * padding path is always exercised; rate ∈ {10,20,25,40,50} keeps
    * dwMicroSecPerFrame integral.
    */
  def makeAvi(i: Long): AviRow = {
    val w = 15 + (i % 4).toInt * 9
    val h = 8 + (i % 3).toInt * 4
    val rate = Vector(10, 20, 25, 40, 50)((i % 5).toInt)
    val nF = 3 + (i % 6).toInt
    val frames = (0 until nF).map { f =>
      val rgb = new Array[Byte](w * h * 3)
      val (r, g, b) = (((7 * i + 13 * f) % 256).toByte,
        ((11 * i + 17 * f) % 256).toByte, ((5 * i + 19 * f) % 256).toByte)
      var p = 0
      while (p < rgb.length) { rgb(p) = r; rgb(p + 1) = g; rgb(p + 2) = b; p += 3 }
      rgb
    }
    // every 7th clip is AUDIO-FIRST (silent auds stream 0, video as
    // stream 1, frames tagged '01db') so the decoder's stream-number
    // binding stays oracle-gated through q77 — the oracle re-derives
    // features from (i)-arithmetic and is layout-blind, so a decoder
    // that hard-codes stream 0 would return zero frames for these rows
    // and fail the hash compare
    AviRow(f"vid-$i%08d",
      graft.pipeline.Avi.encode(w, h, rate, 1, frames,
        audioFirst = i % 7 == 3), w, h, rate, nF)
  }

  def avis(spark: SparkSession, n: Int): Dataset[AviRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(i => makeAvi(i)))
  }

  // ------------------------------------------------------------------
  // 2. frontier_seed — skewed synthetic URL frontier
  // ------------------------------------------------------------------

  final case class SeedUrl(url: String, priority_band: Int,
                           discovered_at: Timestamp, via_image_id: String)

  def makeSeedUrl(seed: Long, i: Long, nHosts: Int): SeedUrl = {
    val rng = new Rng(seed * 7777777L + i)
    rng.nextDouble() // preserved draw order (host now comes from eRng)
    // ~10% duplicates: repeat an earlier row's FULL canonical URL. Both
    // host AND path derive from the effective row's rng — deriving only
    // the path (the earlier form) left the hosts independent, so the
    // actual duplicate rate was the accidental host-collision rate
    // (~0.1%) and every dedupe stage fed by this fixture ran
    // near-vacuous. For non-duplicate rows eRng replays this row's own
    // sequence, so the Zipf-ish host skew (squared uniform concentrates
    // on low ids) is unchanged.
    val effective = if (i > 10 && rng.nextInt(10) == 0) i - 1 - rng.nextInt(10) else i
    val eRng = new Rng(seed * 7777777L + effective)
    val ue = eRng.nextDouble()
    val host = (ue * ue * nHosts).toInt
    // floorMod: `.abs %` is negative for Long.MinValue
    val path = math.floorMod(eRng.nextLong(), 100000L)
    SeedUrl(f"https://h$host%05d.example.test/p/$path",
      rng.nextInt(4),
      new Timestamp(1700000000000L + i * 1000L),
      f"img-${i % 1000}%08d")
  }

  def frontierSeed(spark: SparkSession, n: Int, nHosts: Int = 1000,
                   seed: Long = 42L): Dataset[SeedUrl] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(i => makeSeedUrl(seed, i, nHosts)))
  }

  // ------------------------------------------------------------------
  // 3. robots — politeness fixture
  // ------------------------------------------------------------------

  def robots(spark: SparkSession, nHosts: Int = 1000, seed: Long = 42L): Dataset[RobotsRule] = {
    import spark.implicits._
    spark.range(nHosts).map { h =>
      val rng = new Rng(seed * 31337L + h)
      RobotsRule(f"h$h%05d.example.test",
        250 * (1 + rng.nextInt(4)),
        (0 until rng.nextInt(3)).map(k => s"/private$k"))
    }
  }

  // ------------------------------------------------------------------
  // 4. warc_records — port of the reference generator SEMANTICS
  //    (tests/warc_generator.rs:41-81): per-round seeded sizes
  //    100+1234·round..200+1234·round, blocks 50/50 compressible (every
  //    10th byte 0xFF) vs random, sha1 block digest stamped (base32),
  //    WARC-Type resource, WARC-Target-URI urn:example:test, positions =
  //    exact cumulative byte offsets.
  // ------------------------------------------------------------------

  def warcRecords(round: Int = 0, n: Int = 100, seed: Long = 42L): Seq[WarcRecord] = {
    val rng = new Rng(seed + round)
    var position = 0L
    (0 until n).map { i =>
      val len = 100 + 1234 * round + rng.nextInt(101)
      val block = new Array[Byte](len)
      if (i % 2 == 0) {
        var j = 0
        while (j < len) {
          block(j) = if (j % 10 == 0) 0xff.toByte else (j % 7).toByte; j += 1
        }
      } else {
        var j = 0
        while (j < len) { block(j) = rng.nextLong().toByte; j += 1 }
      }
      val fields = Seq(
        Field("WARC-Record-ID", f"<urn:uuid:graft-$round%04d-$i%08d>"),
        Field("WARC-Type", "resource"),
        Field("WARC-Target-URI", "urn:example:test"),
        Field("WARC-Date", "2025-01-01T00:00:00Z"),
        Field("WARC-Block-Digest", Digests.formatDigest("sha1",
          Digests.compute("sha1", block).get)),
        Field("Content-Length", len.toString))
      val rec = WarcRecord(position, "synth.warc", "WARC/1.1", fields, block)
      position += HeaderSerde.recordLength("WARC/1.1", fields, len.toLong)
      rec
    }
  }

  def warcRecordsDf(spark: SparkSession, round: Int = 0, n: Int = 100,
                    seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.createDataset(warcRecords(round, n, seed)).toDF()
  }
}
