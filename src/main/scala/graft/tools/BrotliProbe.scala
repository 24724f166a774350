package graft.tools

/** Debug: decode base64 brotli from args; -v traces commands. */
object BrotliProbe {
  def main(args: Array[String]): Unit = {
    val c = java.util.Base64.getDecoder.decode(args(0))
    try {
      val out = graft.ops.Brotli.decompress(c)
      println(s"LEN=${out.length}")
      println("OUT=" + new String(out, "ISO-8859-1"))
    } catch { case e: Throwable => println("ERR " + e) }
  }
}
