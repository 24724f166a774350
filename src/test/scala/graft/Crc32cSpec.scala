package graft

import graft.core.Digests
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Crc32cSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  GraftFunctions.register(spark)

  test("crc32c expression matches the RFC 3720 test vector and crc32 differs") {
    // "123456789" -> 0xE3069283 (iSCSI CRC32C check value)
    val row = Seq("123456789").toDF("s")
      .select(GraftFunctions.crc32c($"s".cast("binary")).as("c"),
        crc32($"s".cast("binary")).as("plain"))
      .head
    assert(row.getLong(0) == 0xe3069283L)
    assert(row.getLong(1) != row.getLong(0))
  }

  test("expression agrees with Digests.compute over varied payloads (codegen path)") {
    val data = (0 until 200).map { i =>
      val rng = new graft.synth.Synth.Rng(i.toLong)
      (i, Array.fill(i % 50)(rng.nextLong().toByte))
    }
    val got = data.toDF("i", "b")
      .repartition(4)
      .select($"i", GraftFunctions.crc32c($"b").as("c"))
      .as[(Int, Long)].collect().toMap
    data.foreach { case (i, b) =>
      val expected = java.nio.ByteBuffer.wrap(
        Digests.compute("crc32c", b).get).getInt.toLong & 0xffffffffL
      assert(got(i) == expected, s"row $i")
    }
  }

  test("null-safe + SQL surface") {
    val r = spark.sql("SELECT crc32c(CAST(NULL AS BINARY)) AS c").head
    assert(r.isNullAt(0))
    assert(spark.sql("SELECT crc32c(CAST('' AS BINARY))").head.getLong(0) == 0L)
  }
}
