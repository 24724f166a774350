package graft.tools

import graft.pipeline.Multimodal
import graft.synth.Synth

/** Microbench of the q59 per-row work: PNG decode, phash, and the
  * combined meta+phash UDF body, off-Spark, single thread.
  */
object ImgProbe {
  def main(args: Array[String]): Unit = {
    val pngs: Array[Array[Byte]] =
      Array.tabulate(120)(j => Synth.makeImage(7L, j.toLong).bytes)
    val n = 3000
    // warm
    (0 until 500).foreach(i => Multimodal.decode(pngs(i % 120)))
    var t0 = System.nanoTime()
    val imgs = (0 until n).map(i => Multimodal.decode(pngs(i % 120)).get)
    var t1 = System.nanoTime()
    println(f"decode: ${(t1 - t0) / 1e3 / n}%.1f us/img")
    (0 until 500).foreach(i => Multimodal.phash64(imgs(i % n)))
    t0 = System.nanoTime()
    (0 until n).foreach(i => Multimodal.phash64(imgs(i)))
    t1 = System.nanoTime()
    println(f"phash:  ${(t1 - t0) / 1e3 / n}%.1f us/img")
    t0 = System.nanoTime()
    (0 until n).foreach { i =>
      Multimodal.decode(pngs(i % 120)).map(img => (img.getWidth, img.getHeight, Multimodal.phash64(img)))
    }
    t1 = System.nanoTime()
    println(f"decode+meta+phash: ${(t1 - t0) / 1e3 / n}%.1f us/img")
  }
}
