package graft

import graft.operators.CurationQueries

/** Pins the display-only q238 tokenizer-fertility scorecard (its BPE /
  * unigram token counts are functions of trained models, so no SQL
  * oracle can restate them) by tying it to the oracle-checked q251
  * integer core and bounding the model token counts by arithmetic
  * invariants of any valid segmentation.
  */
class TokenizerFertilitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q238 scorecard: chars/doc accounting matches q251's oracle-checked core per language") {
    val card = CurationQueries.q238(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val core = CurationQueries.q251(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(card.nonEmpty)
    assert(card.keySet === core.keySet, "language partition must agree")
    for ((lang, (nDocs, chars)) <- card) {
      assert((nDocs, chars) === core(lang),
        s"$lang: scorecard (n_docs, chars) diverged from the q251 core")
    }
  }

  test("q238 scorecard: model token counts obey segmentation invariants; fertility >= 1") {
    val rows = CurationQueries.q238(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (lang, chars, bpe, uni) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
      // every token covers >= 1 character, every character is covered:
      // token count in (0, chars]; fertility chars/tokens >= 1
      assert(bpe > 0L && bpe <= chars, s"$lang: bpe_tokens=$bpe chars=$chars")
      assert(uni > 0L && uni <= chars, s"$lang: uni_tokens=$uni chars=$chars")
      assert(r.getDouble(5) >= 1.0 && r.getDouble(6) >= 1.0,
        s"$lang: fertility below 1 — a token shorter than a character")
    }
  }
}
