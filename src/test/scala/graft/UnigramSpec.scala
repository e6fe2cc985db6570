package graft

import graft.functions.UnigramTrainer

/** Unigram-LM (SentencePiece-style) tokenizer: Viterbi optimality
  * against exhaustive search, coverage, the EM+prune training loop,
  * and corpus encoding. Spec-only family (log-probs are libm doubles
  * — the documented oracle-exclusion rule, same as nDCG).
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi finds the max-likelihood split (checked against exhaustive search)") {
    val lp = Map("ab" -> math.log(0.4), "a" -> math.log(0.2),
      "b" -> math.log(0.2), "c" -> math.log(0.2))
    def exhaustive(w: String): Double = {
      if (w.isEmpty) 0.0
      else (1 to math.min(2, w.length)).map { l =>
        lp.get(w.take(l)).map(_ + exhaustive(w.drop(l)))
          .getOrElse(Double.NegativeInfinity)
      }.max
    }
    for (w <- Seq("abab", "aabb", "cab", "abc", "aaaa", "bcab")) {
      val got = UnigramTrainer.viterbi(w, lp, maxLen = 2)
      assert(got.mkString("") === w, "segmentation must be lossless")
      val score = got.map(lp).sum
      assert(math.abs(score - exhaustive(w)) < 1e-12,
        s"$w: viterbi $got scored $score, exhaustive ${exhaustive(w)}")
    }
  }

  test("viterbi ties prefer the longer piece; unseen chars never fail") {
    val lp = Map("ab" -> math.log(0.25), "a" -> math.log(0.5),
      "b" -> math.log(0.5)) // p(ab) == p(a)p(b): a tie
    assert(UnigramTrainer.viterbi("ab", lp, 2) === Seq("ab"))
    // '?' is not in the model: floor-score fallback keeps coverage
    val out = UnigramTrainer.viterbi("a?b", lp, 2)
    assert(out.mkString("") === "a?b")
  }

  test("training keeps the dominant piece and hits the vocab target") {
    // 'spark' appears constantly — its substrings should survive pruning
    val docs = Seq.fill(50)("spark runs spark jobs with spark sql").toDF("text")
    val model = UnigramTrainer.train(docs, "text", vocabSize = 24,
      maxPieceLen = 5, minFreq = 2, emRounds = 2)
    assert(model.logProb.size <= 26, s"vocab ${model.logProb.size} over target")
    assert(model.logProb.contains("spark") || model.logProb.contains("park"),
      s"dominant word's pieces pruned: ${model.logProb.keys.toSeq.sorted}")
    val seg = model.segment("spark")
    assert(seg.mkString("") === "spark")
    assert(seg.length <= 2, s"high-frequency word should segment coarsely: $seg")
  }

  test("encode: corpus round-trips losslessly and reuses per-word segmentation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").limit(40)
    val model = UnigramTrainer.train(docs, "text", vocabSize = 200,
      maxPieceLen = 4, minFreq = 2, emRounds = 1)
    val enc = UnigramTrainer.encode(docs, "doc_id", "text", model)
    val joined = enc.join(docs, "doc_id")
      .select($"doc_id", $"tokens", $"text", $"n_tokens")
    joined.collect().foreach { r =>
      val rebuilt = r.getSeq[String](1).mkString("")
      val want = r.getString(2).trim.replaceAll(" +", " ").replace(" ", "")
      assert(rebuilt === want, s"doc ${r.getLong(0)} round-trip diverged")
      assert(r.getInt(3) === r.getSeq[String](1).size)
    }
  }
}
