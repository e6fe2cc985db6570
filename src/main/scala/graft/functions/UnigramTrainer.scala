package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (the SentencePiece algorithm, Kudo
  * 2018) — the EM-based alternative to BPE, completing the
  * tokenization family: BPE grows a vocabulary bottom-up by merging;
  * the unigram model starts from an over-complete candidate set and
  * PRUNES, segmenting by maximum likelihood at every step. Production
  * tokenizers (T5, Llama's SentencePiece mode, mBART) train this way.
  *
  * Spark mapping (same cost discipline as [[BpeTrainer]] — nothing
  * corpus-sized ever reaches the driver, and every expensive step runs
  * over the DISTINCT-WORD vocabulary, not the corpus):
  *
  *  - **seed**: candidate pieces = all substrings (len ≤ maxPieceLen)
  *    of vocabulary words with corpus frequency ≥ minFreq, plus every
  *    single character unconditionally (coverage guarantee: any word
  *    always segments). One explode + count over the word vocab.
  *  - **E-step**: Viterbi-segment each distinct word under current
  *    piece log-probs (broadcast map; DP is O(len·maxPieceLen) per
  *    word) in mapPartitions, emitting (piece, freq-weighted count)
  *    — reduced by key into the next count table. The piece table is
  *    vocab-bounded, so the collect is driver-safe by construction.
  *  - **M-step**: p(piece) = count / total on the driver.
  *  - **prune**: drop the lowest-probability multi-char pieces (chars
  *    are never pruned) down to `shrinkFactor` of the current size,
  *    never below `vocabSize`; repeat EM until the target size.
  *
  * Determinism: Viterbi ties break toward the LONGER piece ending at
  * the position, so a tie never depends on hash or map iteration
  * order; EM counts are freq-weighted exact longs.
  * log-probs are libm doubles, so like nDCG this family is spec-only
  * (no DuckDB oracle) — the documented exclusion rule.
  */
object UnigramTrainer {

  /** Trained model: piece → log probability. */
  final case class Model(logProb: Map[String, Double], maxPieceLen: Int) {
    /** Viterbi segmentation under the model; unseen characters fall
      * back to a floor score so encode never fails (coverage). */
    def segment(word: String): Seq[String] =
      UnigramTrainer.viterbi(word, logProb, maxPieceLen)
  }

  private val UnseenPenalty = -1e9

  /** Max-likelihood segmentation: DP over end positions; best(i) =
    * max over pieces ending at i. Ties prefer the longer piece. */
  def viterbi(word: String, lp: Map[String, Double], maxLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val best = new Array[Double](n + 1)
    val bestStart = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val piece = word.substring(j, i)
        val sc = best(j) + lp.getOrElse(piece,
          if (i - j == 1) UnseenPenalty else Double.NegativeInfinity)
        // ties prefer the smaller j (= the LONGER piece ending here) —
        // a deterministic rule that never depends on map iteration order
        if (sc > best(i) || (sc == best(i) && j < bestStart(i))) {
          best(i) = sc; bestStart(i) = j
        }
        j += 1
      }
      i += 1
    }
    // backtrack
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val s = bestStart(p)
      out += word.substring(s, p)
      p = s
    }
    out.reverse.toSeq
  }

  /** Distinct words with corpus frequencies (the only corpus pass). */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Train to `vocabSize` pieces. */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, minFreq: Long = 2L, emRounds: Int = 2,
      shrinkFactor: Double = 0.75): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordVocab(docs, textCol).as[(String, Long)]
      .collect() // DISTINCT WORDS ONLY — vocabulary-bounded, not corpus
    // The word vocab is bounded (10k synthetic words here; ~1M for a
    // real corpus, still driver-safe as (string, long) pairs). For a
    // vocab too big to collect, the E-step below is already expressed
    // per-word and runs identically as mapPartitions over a Dataset —
    // the driver loop only ever needs the PIECE table.

    // seed: substring candidates + all chars
    val seedCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, n) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i)) {
      val p = w.substring(i, i + l)
      seedCounts(p) = seedCounts.getOrElse(p, 0L) + n
    }
    val chars = seedCounts.keys.filter(_.length == 1).toSet
    var pieces: Map[String, Long] = seedCounts.toMap
      .filter { case (p, c) => p.length == 1 || c >= minFreq }

    def toLogProb(counts: Map[String, Long]): Map[String, Double] = {
      val total = counts.values.sum.toDouble
      counts.map { case (p, c) => p -> math.log(c / total) }
    }

    var lp = toLogProb(pieces)
    var target = pieces.size
    while (target > vocabSize) {
      target = math.max(vocabSize, (target * shrinkFactor).toInt)
      // EM under current vocab
      for (_ <- 1 to emRounds) {
        val lpB = spark.sparkContext.broadcast(lp)
        val counts =
          try {
            spark.sparkContext
              .parallelize(words.toSeq, math.min(32, math.max(1, words.length / 256)))
              .mapPartitions { it =>
                val local = scala.collection.mutable.Map.empty[String, Long]
                val model = lpB.value
                for ((w, n) <- it; p <- viterbi(w, model, maxPieceLen))
                  local(p) = local.getOrElse(p, 0L) + n
                local.iterator
              }
              .reduceByKey(_ + _).collect().toMap
          } finally lpB.destroy() // one broadcast per round must not accumulate
        // keep unused-but-required chars at count 1 (coverage floor)
        val withChars = chars.foldLeft(counts) { (m, c) =>
          if (m.contains(c)) m else m + (c -> 1L) }
        lp = toLogProb(withChars)
      }
      // prune lowest-prob multi-char pieces down to target
      val keep = lp.toSeq
        .sortBy { case (p, s) => (-s, p) } // best first, stable ties
        .filter(_._1.length > 1)
        .take(math.max(0, target - chars.size))
        .map(_._1).toSet ++ chars
      lp = lp.filter { case (p, _) => keep(p) }
      pieces = pieces.filter { case (p, _) => keep(p) }
    }
    // Renormalize after the final prune: survivors keep pre-prune
    // log-probs whose exp-sum is < 1 — a constant per-piece offset
    // that biases Viterbi toward segmentations with FEWER pieces
    // relative to a proper unigram model. Log-sum-exp for stability.
    val mx = lp.values.max
    val logZ = mx + math.log(lp.values.iterator.map(v => math.exp(v - mx)).sum)
    Model(lp.map { case (p, v) => p -> (v - logZ) }, maxPieceLen)
  }

  /** Corpus tokenization through the vocabulary (BPE-encode shape:
    * segment the distinct words once, broadcast-join back). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    val modelB = spark.sparkContext.broadcast(model)
    val segmentUdf = udf((w: String) => modelB.value.segment(w))
    val words = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .toDF(idCol, "pos", "word")
      .filter(col("word") =!= "")
    val vocabTok = words.select(col("word")).distinct()
      .select(col("word"), segmentUdf(col("word")).as("toks"))
    words.join(broadcast(vocabTok), "word")
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x.getField("toks"))).as("tokens"))
      .select(col(idCol), col("tokens"), size(col("tokens")).as("n_tokens"))
  }
}
