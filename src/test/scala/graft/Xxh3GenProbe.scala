package graft

import graft.core.Xxh3

/** Throwaway probe: which sanity-buffer generator variant reproduces the
  * recalled vectors? Run: sbt "Test/runMain graft.Xxh3GenProbe"
  */
object Xxh3GenProbe {
  def main(args: Array[String]): Unit = {
    val primes = Seq(
      "p64_87" -> 0x9E3779B185EBCA87L,
      "p64_8D" -> 0x9E3779B185EBCA8DL,
      "p64_2"  -> 0xC2B2AE3D27D4EB4FL)
    val starts = Seq(
      "p32"    -> 2654435761L,
      "p32_2"  -> 2246822519L,
      "p64_87" -> 0x9E3779B185EBCA87L,
      "p64_8D" -> 0x9E3779B185EBCA8DL)
    val takeAfter = Seq(false, true)
    val shifts    = Seq(56, 0)
    val targets   = Map(6 -> 0x27B56A84CD2D7325L, 12 -> 0xA713DAF0DFBB77E7L, 24 -> 0xA3FE70BF9D3510EBL)

    for {
      (pn, p)  <- primes
      (sn, s0) <- starts
      after    <- takeAfter
      sh       <- shifts
    } {
      val buf = new Array[Byte](64)
      var g   = s0
      var i   = 0
      while (i < buf.length) {
        if (after) { g *= p; buf(i) = (g >>> sh).toByte }
        else { buf(i) = (g >>> sh).toByte; g *= p }
        i += 1
      }
      val hits = targets.collect { case (len, want) if Xxh3.hash(buf, 0, len) == want => len }
      if (hits.nonEmpty)
        println(s"HIT prime=$pn start=$sn after=$after shift=$sh lens=${hits.mkString(",")}")
    }
    println("probe done")
  }
}
