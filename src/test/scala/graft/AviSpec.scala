package graft

import graft.pipeline.{Avi, Multimodal}
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

/** RIFF/AVI mux + demux (pipeline.Avi): exact pixel recovery through
  * the uncompressed-DIB path, structural robustness of the chunk
  * walker, and the frame-sample op. Closes the video half of the media
  * pipeline (the r04 verdict's last stub).
  */
class AviSpec extends AnyFunSuite {

  private def solid(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    var p = 0
    while (p < px.length) {
      px(p) = r.toByte; px(p + 1) = g.toByte; px(p + 2) = b.toByte; p += 3
    }
    px
  }

  /** Gradient frame: pixel (x,y) = (x%256, y%256, (x+y)%256) — exact
    * recovery proves row order (bottom-up flip) and padding handling,
    * which a solid color cannot distinguish.
    */
  private def gradient(w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      px(p) = (x % 256).toByte
      px(p + 1) = (y % 256).toByte
      px(p + 2) = ((x + y) % 256).toByte
    }
    px
  }

  test("encode -> decode recovers geometry, fps, frame count, exact pixels " +
    "(incl. padded odd-width rows)") {
    for (w <- Seq(15, 16, 17, 33); h <- Seq(5, 8)) {
      val frames = Seq(gradient(w, h), solid(w, h, 1, 2, 3))
      val bytes = Avi.encode(w, h, rate = 25, scale = 1, frames)
      val clip = Avi.decode(bytes).get
      assert((clip.width, clip.height, clip.fpsMilli, clip.frames.size) ==
        ((w, h, 25000L, 2)))
      // exact pixel recovery via the sampled BufferedImage (every=1)
      val imgs = Avi.sampleFrames(clip, 1)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = imgs.head.getRGB(x, y)
        assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) ==
          ((x % 256, y % 256, (x + y) % 256)), s"w=$w h=$h ($x,$y)")
      }
      assert((imgs(1).getRGB(0, 0) & 0xffffff) == 0x010203)
    }
  }

  test("fractional fps: rate/scale survives as fps_milli (29.97 = 30000/1001)") {
    val bytes = Avi.encode(8, 8, rate = 30000, scale = 1001, Seq(solid(8, 8, 0, 0, 0)))
    assert(Avi.decode(bytes).get.fpsMilli == 30000L * 1000 / 1001)
  }

  test("channelSum is exact per frame and sampleFrames picks 0,2,4,...") {
    val frames = (0 until 5).map(f => solid(10, 4, 10 * f, 20 + f, 7))
    val clip = Avi.decode(Avi.encode(10, 4, 10, 1, frames)).get
    for (f <- 0 until 5) {
      assert(clip.channelSum(f, 2) == 40L * (10 * f))
      assert(clip.channelSum(f, 1) == 40L * (20 + f))
      assert(clip.channelSum(f, 0) == 40L * 7)
    }
    val sampled = Avi.sampleFrames(clip, 2)
    assert(sampled.size == 3)
    assert((sampled(1).getRGB(0, 0) >> 16 & 0xff) == 20) // frame 2
    val feats = Avi.features(Avi.encode(10, 4, 10, 1, frames)).get
    assert(feats == ((10, 4, 10000L, 5, 3,
      40L * (0 + 20 + 40), 40L * (20 + 22 + 24), 40L * 21)))
  }

  test("walker robustness: JUNK chunks and idx1 are skipped; garbage, " +
    "truncation, and compressed strf all decode to None") {
    val good = Avi.encode(8, 8, 25, 1, Seq(solid(8, 8, 9, 9, 9)))
    assert(Avi.decode(good).isDefined)
    // splice a JUNK chunk (odd length → pad byte) right before 'idx1'
    val idxAt = {
      var i = good.length - 1
      val tag = "idx1".getBytes("US-ASCII")
      while (i >= 0 && !(good(i) == tag(0) && good.slice(i, i + 4).sameElements(tag))) i -= 1
      i
    }
    assert(idxAt > 0)
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 1, 2, 3, 0) // len 3 + pad
    val spliced = java.nio.ByteBuffer.allocate(good.length + junk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(good, 0, idxAt).put(junk).put(good, idxAt, good.length - idxAt).array()
    // patch the RIFF size for the extra bytes
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + junk.length)
    val (sp, gd) = (Avi.decode(spliced).get, Avi.decode(good).get)
    assert((sp.width, sp.height, sp.fpsMilli) == ((gd.width, gd.height, gd.fpsMilli)))
    assert(sp.frames.size == gd.frames.size &&
      sp.frames.zip(gd.frames).forall { case (a, b) => a.sameElements(b) })

    assert(Avi.decode(null).isEmpty)
    assert(Avi.decode(Array.fill[Byte](64)(0x5a)).isEmpty)
    assert(Avi.decode(good.take(good.length / 2)).isEmpty) // truncated movi
    assert(Avi.decode(good.take(20)).isEmpty)
    // flip biCompression to a codec fourcc → unsupported → None
    val comp = good.clone()
    val strfAt = {
      var i = 0
      val tag = "strf".getBytes("US-ASCII")
      while (!comp.slice(i, i + 4).sameElements(tag)) i += 1
      i
    }
    java.nio.ByteBuffer.wrap(comp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(strfAt + 8 + 16, 0x34363248) // 'H264'
    assert(Avi.decode(comp).isEmpty)
  }

  test("audio-first file: vids as stream 1, frames under '01db', still decoded") {
    // splice a stream-0 'auds' strl ahead of the vids strl and retag the
    // frame chunks '00db' -> '01db' — the decoder must bind frames to
    // the vids STREAM NUMBER, not hard-code stream 0 (an audio-first
    // AVI used to decode as a vacuously-valid zero-frame clip).
    // pixel values avoid ASCII '0','d','b' so the retag can't touch data
    val good = Avi.encode(8, 8, 25, 1, Seq(solid(8, 8, 9, 9, 9), solid(8, 8, 20, 40, 50)))
    val strlAt = { // offset of the strl LIST header ("LIST" tag)
      var i = 0
      val tag = "strl".getBytes("US-ASCII")
      while (!good.slice(i, i + 4).sameElements(tag)) i += 1
      i - 8
    }
    val auds = java.nio.ByteBuffer.allocate(100)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def put4(s: String): Unit = { auds.put(s.getBytes("US-ASCII")); () }
    put4("LIST"); auds.putInt(92); put4("strl")
    put4("strh"); auds.putInt(56); put4("auds"); auds.position(auds.position() + 52)
    put4("strf"); auds.putInt(16); auds.position(auds.position() + 16)
    val spliced = java.nio.ByteBuffer.allocate(good.length + 100)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(good, 0, strlAt).put(auds.array()).put(good, strlAt, good.length - strlAt)
      .array()
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + 100)   // RIFF size
    bb.putInt(16, bb.getInt(16) + 100) // hdrl LIST size
    val zero = "00db".getBytes("US-ASCII")
    var i = 0
    while (i + 4 <= spliced.length) { // retag every frame chunk / idx1 entry
      if (spliced.slice(i, i + 4).sameElements(zero)) spliced(i + 1) = '1'.toByte
      i += 1
    }
    val (sp, gd) = (Avi.decode(spliced).get, Avi.decode(good).get)
    assert((sp.width, sp.height, sp.fpsMilli) == ((gd.width, gd.height, gd.fpsMilli)))
    assert(sp.frames.size == 2 &&
      sp.frames.zip(gd.frames).forall { case (a, b) => a.sameElements(b) })
  }

  test("crafted near-Int.MaxValue chunk length -> None, no multi-GB allocation") {
    // body + len would wrap negative and slip past a `body + len > end`
    // guard straight into new Array[Byte](len); the overflow-safe form
    // (`len > end - body`) must reject it as a chunk overrun
    val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(56).put("AVI ".getBytes("US-ASCII"))
    bb.put("00db".getBytes("US-ASCII")).putInt(0x7ffffff0)
    assert(Avi.decode(bb.array()).isEmpty)
  }

  test("deeply nested LIST bomb -> None, never StackOverflowError") {
    // 10k nested LISTs at 12 bytes/level: unbounded recursion would blow
    // the stack with an error NonFatal does NOT catch (the task dies);
    // the depth cap must turn it into the normal None contract
    val levels = 10000
    val bb = java.nio.ByteBuffer.allocate(12 + 12 * levels)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 12 * levels)
      .put("AVI ".getBytes("US-ASCII"))
    var remaining = 12 * levels
    while (remaining > 0) {
      bb.put("LIST".getBytes("US-ASCII")).putInt(remaining - 8)
        .put("hdrl".getBytes("US-ASCII"))
      remaining -= 12
    }
    assert(Avi.decode(bb.array()).isEmpty)
  }

  test("Synth.avis features match index arithmetic (the q77 oracle form)") {
    for (i <- 0L until 24L) {
      val row = Synth.makeAvi(i)
      val (w, h, nf) = (15 + (i % 4).toInt * 9, 8 + (i % 3).toInt * 4, 3 + (i % 6).toInt)
      val rate = Vector(10, 20, 25, 40, 50)((i % 5).toInt)
      val f = Avi.features(row.bytes).get
      val sampled = (0 until nf by 2)
      def s(a: Long, b: Long) = sampled.map(fr => (a * i + b * fr) % 256).sum * w * h
      assert(f == ((w, h, rate * 1000L, nf, sampled.size,
        s(7, 13), s(11, 17), s(5, 19))), s"i=$i")
    }
  }

  test("sampled AVI frames round-trip through the image pipeline " +
    "(phash + PNG re-encode, the frame->training-table hop)") {
    val clip = Avi.decode(Synth.makeAvi(3L).bytes).get
    val img = Avi.sampleFrames(clip, 2).head
    val png = Multimodal.encode(img, "png")
    val back = Multimodal.decode(png).get
    assert(Multimodal.phash64(back) == Multimodal.phash64(img))
    assert(back.getWidth == clip.width && back.getHeight == clip.height)
  }
}
