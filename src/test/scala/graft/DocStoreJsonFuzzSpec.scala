package graft

import org.apache.spark.sql.functions._

/** Seeded fuzz round-trip for the docstore sink's hand-rolled JSON
  * escaper: ~516 adversarial strings — every control character, quote/
  * backslash runs, multi-byte BMP and supplementary (surrogate-pair)
  * code points, JSON-syntax lookalikes — written through the real V2
  * writer and read back with Spark's JSON reader must come back
  * byte-identical. Lone surrogates are excluded by construction: they
  * are not valid Unicode scalar values, cannot encode to UTF-8, and
  * the file contract (UTF-8 JSON lines) rejects them upstream of the
  * escaper.
  */
class DocStoreJsonFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def fuzzStrings: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val explicit = Seq(
      "", "\"", "\\", "\\\\\"", "\n\r\t", "\u0000\u0001\u001f",
      "{\"k\":\"v\"}", "[1,2,3]", "null", "NaN", "\\u0041",
      "é½漢字🚀𐍈", "a\"b\\c\nd\te\rf", "     ",
      "ends with backslash\\", "\"starts with quote")
    val random = (1 to 500).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map { _ =>
        rnd.nextInt(5) match {
          case 0 => (rnd.nextInt(0x20)).toChar.toString          // control
          case 1 => Seq("\"", "\\", "/", "\n", "\t")(rnd.nextInt(5))
          case 2 => (0x20 + rnd.nextInt(0x5f)).toChar.toString   // ascii
          case 3 => (0xa0 + rnd.nextInt(0x2000)).toChar.toString // BMP
          case _ => // valid supplementary code point (surrogate PAIR)
            new String(Character.toChars(0x10000 + rnd.nextInt(0x10000)))
        }
      }.mkString
    }
    explicit ++ random
  }

  test("docstore JSON lines round-trip ~516 adversarial strings byte-identically") {
    val dir = java.nio.file.Files.createTempDirectory("docfuzz").toString
    val rows = fuzzStrings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    rows.toDF("id", "s")
      .write.format("graft.sources.v2.DocStoreDataSource")
      .option("path", dir).mode("append").save()
    val back = spark.read
      .schema("id LONG, s STRING")
      .option("mode", "FAILFAST") // any malformed line fails loudly
      .json(dir + "/part-*.jsonl")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(back.size === rows.size)
    rows.foreach { case (i, s) =>
      assert(back(i) === s, s"string $i diverged: ${s.take(40)}")
    }
  }
}
