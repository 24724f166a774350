package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/** Hermetic RIFF/AVI video container support — mux + demux + feature
  * extraction, pure JVM, no codec libraries.
  *
  * Closes the video half of the media pipeline (the round-4 verdict's
  * last stub): uncompressed DIB frames (`BI_RGB`, 24-bit bottom-up BGR
  * with 4-byte row padding — the AVI baseline every demuxer must
  * support) are decoded to exact pixels, so frame sampling and
  * per-frame statistics are bit-reproducible by an oracle from the
  * synthesis parameters. Compressed codecs (H.264 etc.) remain out of
  * scope for this container — [[aviFeatures]] returns None for them,
  * mirroring how `Multimodal.decode` returns None for non-image bytes,
  * and `Multimodal.stubMediaFeatures` stays the loudly-marked fallback
  * for those.
  *
  * Container layout written/read (all little-endian):
  * {{{
  * RIFF 'AVI ' { LIST 'hdrl' { 'avih', LIST 'strl' { 'strh', 'strf' } },
  *               LIST 'movi' { '00db' frame ... }, 'idx1' }
  * }}}
  * The demuxer walks chunks structurally: unknown chunks (JUNK, extra
  * streams, 'idx1') are skipped, odd-sized chunks honor the RIFF pad
  * byte, and 'NNdb'/'NNdc' frame chunks are grouped per stream number
  * so the video frames are found even when the 'vids' stream is not
  * stream 0 (audio-first files).
  */
object Avi {

  /** One decoded clip: header metadata + frame pixel accessor. `fps` is
    * exposed in milli-fps (`rate * 1000 / scale` from 'strh') so
    * downstream columns stay integral.
    */
  final case class Clip(width: Int, height: Int, fpsMilli: Long,
                        frames: Vector[Array[Byte]]) {
    /** Mean of one channel (0=B,1=G,2=R in DIB order) over frame `i`,
      * exact for solid-color frames: returns (sum, count).
      */
    def channelSum(i: Int, ch: Int): Long = {
      val rowBytes = ((width * 3 + 3) / 4) * 4
      val px = frames(i)
      var sum = 0L
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          sum += px(y * rowBytes + x * 3 + ch) & 0xff
          x += 1
        }
        y += 1
      }
      sum
    }
  }

  private def fourCC(s: String): Int = {
    val b = s.getBytes("US-ASCII")
    (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
  }
  private val RIFF = fourCC("RIFF")
  private val LIST = fourCC("LIST")

  /** Encode an AVI with uncompressed 24-bit DIB frames. `framesRgb(i)`
    * is row-major top-down (r,g,b) triplets, `width*height*3` bytes —
    * the encoder flips to the DIB bottom-up BGR layout and pads rows.
    * `rate`/`scale` define fps (dwRate/dwScale in 'strh');
    * `1000000L * scale / rate` must fit avih's dwMicroSecPerFrame.
    * `audioFirst` emits a (silent, zero-sample) 'auds' stream as stream
    * 0 ahead of the video — the spec-legal audio-first layout many
    * muxers produce, where video frames arrive as '01db', not '00db';
    * the synthetic corpus uses it to keep the decoder's stream-number
    * binding oracle-gated.
    */
  def encode(width: Int, height: Int, rate: Int, scale: Int,
             framesRgb: Seq[Array[Byte]],
             audioFirst: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && rate > 0 && scale > 0)
    val rowBytes = ((width * 3 + 3) / 4) * 4
    val frameBytes = rowBytes * height
    val nF = framesRgb.size
    // RIFF sizes, inside-out (every LIST size field counts its BODY,
    // which starts with the list-type fourcc; chunk headers are 8).
    // frameBytes is even (rowBytes % 4 == 0) so no pad bytes anywhere.
    val audsStrlBody = 4 + (8 + 56) + (8 + 16)   // 'strl' + strh + empty strf
    val strlBody = 4 + (8 + 56) + (8 + 40)       // 'strl' + strh + strf
    val hdrlBody = 4 + (8 + 56) + (8 + strlBody) + // 'hdrl' + avih + LIST strl
      (if (audioFirst) 8 + audsStrlBody else 0)
    val moviBody = 4 + nF * (8 + frameBytes)     // 'movi' + frame chunks
    val idx1Body = nF * 16
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody) + (8 + idx1Body)
    val frameTag = if (audioFirst) "01db" else "00db"
    val bb = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = { bb.putInt(fourCC(s)); () }
    tag("RIFF"); bb.putInt(riffBody); tag("AVI ")
    tag("LIST"); bb.putInt(hdrlBody); tag("hdrl")
    tag("avih"); bb.putInt(56)
    bb.putInt((1000000L * scale / rate).toInt) // dwMicroSecPerFrame
      .putInt(rate * frameBytes / scale)       // dwMaxBytesPerSec
      .putInt(0).putInt(0x10)                  // padding, AVIF_HASINDEX
      .putInt(nF).putInt(0)                    // totalFrames, initial
      .putInt(if (audioFirst) 2 else 1)        // streams
      .putInt(frameBytes).putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    if (audioFirst) { // stream 0: silent 'auds' (zero samples, zero strf)
      tag("LIST"); bb.putInt(audsStrlBody); tag("strl")
      tag("strh"); bb.putInt(56); tag("auds")
      bb.position(bb.position() + 52)          // zeroed rest of strh
      tag("strf"); bb.putInt(16)
      bb.position(bb.position() + 16)          // zeroed WAVEFORMAT
    }
    tag("LIST"); bb.putInt(strlBody); tag("strl")
    tag("strh"); bb.putInt(56)
    tag("vids"); tag("DIB ")
    bb.putInt(0).putInt(0).putInt(0)           // flags, prio+lang, initialFrames
      .putInt(scale).putInt(rate)              // dwScale, dwRate
      .putInt(0).putInt(nF)                    // start, length
      .putInt(frameBytes).putInt(-1).putInt(0) // bufSize, quality, sampleSize
      .putShort(0).putShort(0)                 // rcFrame left, top
      .putShort(width.toShort).putShort(height.toShort)
    tag("strf"); bb.putInt(40)
    bb.putInt(40).putInt(width).putInt(height) // biSize, biWidth, biHeight (+ = bottom-up)
      .putShort(1).putShort(24)                // planes, bitcount
      .putInt(0)                               // BI_RGB
      .putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); bb.putInt(moviBody); tag("movi")
    val moviTagPos = bb.position() - 4 // idx1 offsets are from the 'movi' fourcc
    val frameOffsets = new Array[Int](nF)
    var i = 0
    while (i < nF) {
      frameOffsets(i) = bb.position() - moviTagPos
      tag(frameTag); bb.putInt(frameBytes)
      val rgb = framesRgb(i)
      require(rgb.length == width * height * 3,
        s"frame $i: ${rgb.length} bytes, want ${width * height * 3}")
      var y = height - 1
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val p = (y * width + x) * 3
          bb.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR
          x += 1
        }
        var pad = rowBytes - width * 3
        while (pad > 0) { bb.put(0: Byte); pad -= 1 }
        y -= 1
      }
      i += 1
    }
    tag("idx1"); bb.putInt(idx1Body)
    i = 0
    while (i < nF) {
      tag(frameTag); bb.putInt(0x10) // AVIIF_KEYFRAME
      bb.putInt(frameOffsets(i)).putInt(frameBytes)
      i += 1
    }
    bb.array()
  }

  /** Demux an AVI: header metadata + every stream-0 video frame's raw
    * DIB bytes. None on anything malformed, non-AVI, or compressed
    * (biCompression != BI_RGB or biBitCount != 24) — same None-on-
    * unsupported contract as `Multimodal.decode`/`wavFeatures`.
    */
  def decode(bytes: Array[Byte]): Option[Clip] =
    if (bytes == null || bytes.length < 24) None
    else try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (bb.getInt() != RIFF) return None
      val riffLen = bb.getInt()
      if (riffLen < 4 || bb.getInt() != fourCC("AVI ")) return None
      var width, height = 0
      var rate, scale = 0
      var bitCount = -1
      var compression = -1
      var sawAvih, sawVids = false
      var strhSeen = 0     // streams appear in strl order: strh #k is stream k
      var vidsStream = -1  // stream number of the first 'vids' stream
      val framesByStream =
        scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Array[Byte]]]
      // 'NNdb'/'NNdc' → stream number NN (two ASCII decimal digits), else -1
      def frameChunkStream(id: Int): Int = {
        val c0 = id & 0xff; val c1 = (id >>> 8) & 0xff
        val c2 = (id >>> 16) & 0xff; val c3 = (id >>> 24) & 0xff
        if (c0 >= '0' && c0 <= '9' && c1 >= '0' && c1 <= '9' &&
            c2 == 'd' && (c3 == 'b' || c3 == 'c')) (c0 - '0') * 10 + (c1 - '0')
        else -1
      }
      // walk: LIST bodies are walked recursively; leaf chunks by id.
      // Depth-capped: a crafted file of nested LISTs (12 bytes/level)
      // would otherwise recurse to StackOverflowError, which NonFatal
      // does NOT catch — the task would die instead of returning None.
      // Real AVI nests 3 deep (RIFF > hdrl > strl); 64 is generous.
      def walk(end: Int, depth: Int): Unit = {
        if (depth > 64) throw new RuntimeException("LIST nesting too deep")
        while (bb.position() + 8 <= end) {
          val id = bb.getInt()
          val len = bb.getInt()
          val body = bb.position()
          // `len > end - body` (not `body + len > end`): both sides are
          // non-negative so a crafted len near Int.MaxValue cannot wrap
          // past the guard into a multi-GB allocation below
          if (len < 0 || len > end - body) throw new RuntimeException("chunk overruns")
          // a zero-length chunk with id 0 is trailing garbage, and
          // skipping it would not advance the walk — abort
          if (id == 0) throw new RuntimeException("null chunk id")
          if (id == LIST) {
            bb.getInt() // list type ('hdrl'/'strl'/'movi'/...)
            walk(body + len, depth + 1)
          } else if (id == fourCC("avih") && len >= 40) {
            bb.getInt(); bb.getInt(); bb.getInt(); bb.getInt(); bb.getInt()
            bb.getInt(); bb.getInt(); bb.getInt()
            width = bb.getInt(); height = bb.getInt()
            sawAvih = true
          } else if (id == fourCC("strh") && len >= 48) {
            val fccType = bb.getInt()
            if (fccType == fourCC("vids") && !sawVids) {
              sawVids = true
              vidsStream = strhSeen
              bb.getInt(); bb.getInt(); bb.getInt(); bb.getInt()
              scale = bb.getInt(); rate = bb.getInt()
            }
            strhSeen += 1
          } else if (id == fourCC("strf") && sawVids && bitCount < 0 && len >= 40) {
            bb.getInt(); bb.getInt(); bb.getInt(); bb.getShort()
            bitCount = bb.getShort() & 0xffff
            compression = bb.getInt()
          } else if (frameChunkStream(id) >= 0) {
            val f = new Array[Byte](len)
            bb.get(f)
            framesByStream.getOrElseUpdate(frameChunkStream(id),
              scala.collection.mutable.ArrayBuffer.empty) += f
          }
          // skip to next chunk: body + len + RIFF pad byte for odd len
          bb.position(body + len + (len & 1))
        }
      }
      walk(math.min(bytes.length, 8 + riffLen), 0)
      val rowBytes = ((width * 3 + 3) / 4) * 4
      val out = framesByStream.get(vidsStream)
        .map(_.toVector).getOrElse(Vector.empty)
      if (!sawAvih || !sawVids || width <= 0 || height <= 0 ||
          rate <= 0 || scale <= 0 ||
          bitCount != 24 || compression != 0 ||
          out.exists(_.length != rowBytes * height)) None
      else Some(Clip(width, height, rate.toLong * 1000 / scale, out))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Frame sampling: every `every`-th frame (0, every, 2*every, ...) as
    * a `BufferedImage` — the training-pipeline "frame-sample" op.
    */
  def sampleFrames(clip: Clip, every: Int): Seq[java.awt.image.BufferedImage] = {
    val rowBytes = ((clip.width * 3 + 3) / 4) * 4
    (0 until clip.frames.size by every).map { i =>
      val img = new java.awt.image.BufferedImage(
        clip.width, clip.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = clip.frames(i)
      var y = 0
      while (y < clip.height) {
        val row = (clip.height - 1 - y) * rowBytes // bottom-up
        var x = 0
        while (x < clip.width) {
          val b = px(row + x * 3) & 0xff
          val g = px(row + x * 3 + 1) & 0xff
          val r = px(row + x * 3 + 2) & 0xff
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      img
    }
  }

  /** Column-level features, oracle-exact: (w, h, fps_milli, n_frames,
    * n_sampled, sum of per-sampled-frame channel sums for R, G, B).
    * Sampling every 2nd frame — the scale shape (decode only what the
    * pipeline keeps). None for non-AVI/compressed input.
    */
  def features(bytes: Array[Byte], every: Int = 2)
      : Option[(Int, Int, Long, Int, Int, Long, Long, Long)] =
    decode(bytes).map { c =>
      val idx = 0 until c.frames.size by every
      var (sr, sg, sb) = (0L, 0L, 0L)
      idx.foreach { i =>
        sr += c.channelSum(i, 2); sg += c.channelSum(i, 1); sb += c.channelSum(i, 0)
      }
      (c.width, c.height, c.fpsMilli, c.frames.size, idx.size, sr, sg, sb)
    }

  val featuresUdf = org.apache.spark.sql.functions.udf {
    (bytes: Array[Byte]) => features(bytes)
  }
}
