package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge induction — the tokenizer-training step of a
  * training-data pipeline, as a deterministic driver loop (same shape
  * as the PageRank loop, q91): each round is one distributed pair-count
  * aggregation over the WORD VOCABULARY (words carry their corpus
  * frequency, so the corpus is tokenized once, not once per round),
  * one argmax collect (a single row to the driver), and a column-only
  * rewrite of the symbol arrays. Driver state is just the merge table.
  *
  * 100 TB shape: the vocabulary relation (distinct words × frequency)
  * is orders of magnitude smaller than the corpus; rounds shuffle only
  * (pair, count). Ties break deterministically (count desc, pair asc).
  */
object BpeTrainer {

  /** Adjacent symbol pairs of an array column, "a b" strings
    * (shared helper — one definition of the guard/shape). */
  private def pairsOf(syms: Column): Column = TextAnalysis.adjacentPairs(syms)

  /** Merge every non-overlapping left-to-right occurrence of (a, b)
    * into the single symbol a+b — a pure fold: the accumulator carries
    * the rebuilt prefix plus one pending symbol of lookbehind. */
  private def mergePair(syms: Column, a: String, b: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("p"))
    val flushed = (acc: Column) =>
      when(acc("p").isNull, acc("out")).otherwise(concat(acc("out"), array(acc("p"))))
    aggregate(syms, zero,
      (acc, x) =>
        when(acc("p") === a && x === b,
          struct(concat(acc("out"), array(lit(a + b))).as("out"),
            lit(null).cast("string").as("p")))
          .otherwise(struct(flushed(acc).as("out"), x.as("p"))),
      acc => flushed(acc))
  }

  /** Word vocabulary with corpus frequencies and initial char symbols
    * (plus the </w> end-of-word marker). */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(col("n"),
        concat(split(col("word"), ""), array(lit("</w>"))).as("syms"))

  /** Frequency of every adjacent symbol pair, weighted by word count. */
  def pairCounts(v: DataFrame): DataFrame =
    v.select(col("n"), explode(pairsOf(col("syms"))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))

  /** Train `k` merges; returns them in order. Ties break on Spark's
    * UTF8 BINARY string order ("cnt desc, pair asc") — identical to
    * DuckDB's collation in the q113 oracle; callers comparing against
    * a JVM reference must compare UTF-8 bytes, not UTF-16 Strings.
    *
    * Each round materializes via eager `localCheckpoint` — a persist
    * alone keeps the full lineage, so round r's plan would nest r
    * mergePair folds (O(k²) analysis cost and eventual planner stack
    * overflow at real merge counts). Training stops early when no
    * pair remains. */
  def train(docs: DataFrame, textCol: String, k: Int): Seq[(String, String)] = {
    var v = vocab(docs, textCol).transform(graft.Fx.materialize)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    for (_ <- 1 to k if !exhausted) {
      val top = pairCounts(v)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Array(a, b) = top.head.getString(0).split(" ", 2)
        merges += ((a, b))
        val next = v.select(col("n"), mergePair(col("syms"), a, b).as("syms"))
          .transform(graft.Fx.materialize) // eager: materialized before the old blocks go
        // Free round r-1's checkpoint blocks, or block-manager storage
        // grows O(k × vocab) over the merge loop (k is in the tens of
        // thousands for a real tokenizer).
        graft.Fx.free(v)
        v = next
      }
    }
    graft.Fx.free(v)
    merges.toSeq
  }

  /** Batched trainer: each round collects the top candidates ONCE and
    * applies the largest symbol-disjoint prefix of the ranked list in
    * a single rewrite job — `batch`× fewer Spark jobs than [[train]],
    * which pays one full pair-count job + collect per merge (the
    * verdict-flagged cost model: k sequential jobs for k merges).
    *
    * Why symbol-disjoint: a merge (a,b) cannot change the occurrence
    * count of any pair whose symbols avoid {a,b} — merging replaces
    * two symbols by one, so it never creates a new adjacency between
    * surviving symbols. Disjoint merges therefore commute, and the
    * one-pass batch rewrite is EXACTLY the sequential application of
    * the chosen merges in rank order. The only divergence from
    * classic BPE is that a pair CREATED by a merge can't be selected
    * until the next round — the standard batched-BPE trade; at
    * `batch = 1` this IS classic BPE (spec-pinned against [[train]]).
    * Ties and ranking break identically to [[train]] (cnt desc, pair
    * asc on UTF-8 order). */
  def trainBatched(docs: DataFrame, textCol: String, k: Int,
      batch: Int = 16): Seq[(String, String)] = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    var v = vocab(docs, textCol).transform(graft.Fx.materialize)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < k && !exhausted) {
      val want = math.min(batch, k - merges.size)
      // over-fetch so the disjoint filter can skip conflicting ranks;
      // the list is tiny (≤ 4·batch rows) either way
      val top = pairCounts(v)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(want * 4).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val chosen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        for (row <- top if chosen.size < want) {
          val Array(a, b) = row.getString(0).split(" ", 2)
          if (!used(a) && !used(b)) {
            chosen += ((a, b)); used += a; used += b
          }
        }
        merges ++= chosen
        val next = v.select(col("n"),
          chosen.foldLeft(col("syms")) { case (c, (a, b)) => mergePair(c, a, b) }
            .as("syms"))
          .transform(graft.Fx.materialize)
        graft.Fx.free(v)
        v = next
      }
    }
    graft.Fx.free(v)
    merges.toSeq
  }

  /** Apply a trained merge table to one word's symbol array: each
    * merge rewrites all non-overlapping left-to-right occurrences, in
    * training order — exactly the rewrite the trainer performed, so a
    * word from the training corpus re-encodes to its training-time
    * segmentation. The expression nests one fold per merge; see
    * [[encode]] for why that cost lands on the vocabulary, never the
    * corpus. */
  def encodeWord(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (a, b)) => mergePair(c, a, b) }

  /** Corpus tokenization — the deploy step after [[train]]: encode
    * the DISTINCT-WORD vocabulary once (the k nested merge folds run
    * over the bounded vocab relation), then broadcast-join word →
    * tokens back onto the exploded corpus and reassemble per document
    * in word order. At 100 TB the vocabulary is orders of magnitude
    * smaller than the corpus, so the expensive rewrite never touches
    * corpus-sized data and the corpus-side plan is scan + broadcast
    * join + one per-doc aggregation.
    *
    * @return (idCol, tokens array<string>, n_tokens) */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .toDF(idCol, "pos", "word")
      .filter(col("word") =!= "")
    val vocabTok = words.select(col("word")).distinct()
      .select(col("word"),
        encodeWord(concat(split(col("word"), ""), array(lit("</w>"))), merges)
          .as("toks"))
    words.join(broadcast(vocabTok), "word")
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x.getField("toks"))).as("tokens"))
      .select(col(idCol), col("tokens"), size(col("tokens")).as("n_tokens"))
  }

  /** Decode — the inverse of [[encode]]: merges only ever JOIN
    * adjacent symbols, so concatenating the token stream and turning
    * each `</w>` marker back into a space recovers the word sequence
    * exactly (single-space normalized — [[encode]] drops empty
    * tokens). This losslessness is WHY BPE is safe on training data:
    * no character is ever dropped or invented, which the round-trip
    * spec pins corpus-wide. Pure column expressions — decode runs at
    * scan speed with no join at all. */
  def decode(encoded: DataFrame, idCol: String,
      tokensCol: String = "tokens"): DataFrame =
    encoded.select(col(idCol),
      rtrim(replace(array_join(col(tokensCol), ""), lit("</w>"), lit(" ")))
        .as("text"))
}
