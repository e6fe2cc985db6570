package graft

import graft.functions.BpeTrainer

/** BPE merge induction vs an independent in-memory reference
  * implementation (classic sequential BPE over a word-frequency
  * vocabulary with the same count-desc / pair-asc tie-break).
  */
class BpeSpec extends SparkSpec {

  /** Sequential reference: the textbook algorithm. */
  private def referenceMerges(text: String, k: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] = text.split(" ").filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.split("").toList :+ "</w>") -> ws.length.toLong
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + n
      if (counts.nonEmpty) {
        // tie-break on UTF-8 BYTES (Spark/DuckDB binary collation), not
        // UTF-16 String order — they diverge for supplementary chars
        implicit val utf8Order: Ordering[String] = (x: String, y: String) => {
          val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
          val n = math.min(a.length, b.length)
          var i = 0
          while (i < n && a(i) == b(i)) i += 1
          if (i < n) (a(i) & 0xff) - (b(i) & 0xff) else a.length - b.length
        }
        val best = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a + " " + b) }(
            Ordering.Tuple2(Ordering.Long, utf8Order))._1
        merges += best
        vocab = vocab.map { case (syms, n) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += best._1 + best._2; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toList -> n
        }.groupBy(_._1).map { case (s, m) => s -> m.map(_._2).sum }
      }
    }
    merges.toSeq
  }

  test("distributed BPE trainer reproduces the sequential reference merges") {
    import spark.implicits._
    val text = ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).trim
    val docs = Seq(text).toDF("text")
    val got = BpeTrainer.train(docs, "text", k = 6)
    val want = referenceMerges(text, 6)
    assert(got == want, s"got $got, want $want")
    // sanity on the classic example: 'es' and then 'est' merge early
    assert(want.take(3).map(m => m._1 + m._2).contains("es"))
  }

  test("merge handles the overlapping-run edge case non-greedily left-to-right") {
    import spark.implicits._
    // 'aaa' under merge (a,a): left-to-right non-overlap → ['aa','a'].
    // k=2 makes round 2's argmax depend on round 1's REWRITE (k=1
    // would return before any merged vocabulary is observed): correct
    // rewrite gives pairs {(aa,a),(a,</w>)}; a greedy-overlap bug
    // gives {(aa,aa),(aa,</w>)} and picks a different second merge.
    val docs = Seq("aaa aaa").toDF("text")
    val got = BpeTrainer.train(docs, "text", k = 2)
    val want = referenceMerges("aaa aaa", 2)
    assert(got == want)
    assert(got(1) == ("a", "</w>"), s"second merge exposes the rewrite: $got")
  }

  /** Sequential reference encode: apply merges in order, each
    * rewriting non-overlapping occurrences left-to-right. */
  private def referenceEncode(word: String, merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(word.split("").toList :+ "</w>") { case (syms, (a, b)) =>
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }

  test("encode: trained merges tokenize the corpus; round-trips and matches the reference") {
    import spark.implicits._
    val text = ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).trim
    val docs = Seq((1L, text), (2L, "lowest newest low")).toDF("id", "text")
    val merges = BpeTrainer.train(docs, "text", k = 8)
    val out = BpeTrainer.encode(docs, "id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // lossless: stripping </w> and concatenating reproduces the text
    for ((id, t) <- Seq((1L, text), (2L, "lowest newest low"))) {
      val rebuilt = out(id).mkString("").replace("</w>", " ").trim
      assert(rebuilt == t, s"doc $id round-trip: $rebuilt")
    }
    // token-exact vs the sequential reference, word by word
    val wantDoc2 = "lowest newest low".split(" ")
      .flatMap(w => referenceEncode(w, merges)).toSeq
    assert(out(2L) == wantDoc2, s"got ${out(2L)}, want $wantDoc2")
    // merges actually compress: fewer tokens than characters
    assert(out(1L).size < text.replace(" ", "").length)
  }

  test("decode(encode(corpus)) is lossless on the word sequence, corpus-wide") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val merges = BpeTrainer.train(docs.limit(50), "text", k = 30)
    val decoded = BpeTrainer.decode(
      BpeTrainer.encode(docs, "doc_id", "text", merges), "doc_id")
    val diff = decoded.join(
        docs.select($"doc_id",
          // single-space-normalized original (encode drops empties)
          org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.trim($"text"), " +", " ").as("want")), "doc_id")
      .filter($"text" =!= $"want")
    assert(diff.count() == 0,
      s"round-trip diverged on: ${diff.select("doc_id").collect().take(5).mkString(",")}")
  }

  test("trainBatched(batch=1) IS classic BPE — identical merges to train") {
    import spark.implicits._
    val text = ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).trim
    val docs = Seq(text).toDF("text")
    val seq = BpeTrainer.train(docs, "text", k = 6)
    val b1 = BpeTrainer.trainBatched(docs, "text", k = 6, batch = 1)
    assert(b1 == seq, s"batch=1 diverged: got $b1, want $seq")
  }

  test("trainBatched merges are symbol-disjoint per round and encode losslessly") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").limit(60)
    val merges = BpeTrainer.trainBatched(docs, "text", k = 24, batch = 8)
    assert(merges.size == 24)
    assert(merges.distinct.size == merges.size, "duplicate merge emitted")
    // the batched table is a valid BPE table: decode(encode) is lossless
    val decoded = BpeTrainer.decode(
      BpeTrainer.encode(docs, "doc_id", "text", merges), "doc_id")
    val diff = decoded.join(
        docs.select($"doc_id",
          org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.trim($"text"), " +", " ").as("want")), "doc_id")
      .filter($"text" =!= $"want")
    assert(diff.count() == 0)
  }

  test("training releases every round's checkpoint blocks") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val docs = Seq(("low " * 5 + "newest " * 6).trim).toDF("text")
    BpeTrainer.train(docs, "text", k = 8)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"train leaked ${leaked.size} checkpointed RDDs: $leaked")
  }
}
