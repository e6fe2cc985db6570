package graft

import graft.operators.IndexingQueries
import org.apache.spark.sql.functions._

class IndexingQueriesSpec extends SparkSpec {

  /** Write a tiny documents table and return its parent dir (queries
    * load `$dir/documents.parquet`). */
  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("idxq").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q166 prefix filter is lossless vs brute force on a crafted corpus") {
    import spark.implicits._
    // 12 docs of 10 distinct tokens each: pairs sharing 9+ of 10 tokens
    // pass θ=0.9 (J = 9/11 < 0.9 fails; identical docs J=1 pass; 9-of-10
    // J = 9/11 ≈ 0.818 fails ⇒ only identical-token-set pairs survive).
    // Build three exact-duplicate groups + noise docs and check the
    // prefix join finds exactly the within-group pairs.
    val mk = (ws: Seq[String]) => ws.mkString(" ")
    val grp = (tag: String) => (1 to 10).map(i => s"$tag$i")
    val rows = Seq[(Long, String, String, String, Long)](
      (1L, mk(grp("a")), "en", "s1", 0L),
      (2L, mk(grp("a").reverse), "en", "s1", 0L),    // same set, diff order
      (3L, mk(grp("b")), "en", "s1", 0L),
      (4L, mk(grp("b")), "en", "s1", 0L),
      (5L, mk(grp("b")), "en", "s1", 0L),
      (6L, mk(grp("c")), "en", "s1", 0L),
      (7L, mk(grp("a")), "en", "s2", 0L),            // other block: excluded
      (8L, mk(grp("a").take(9) :+ "odd1"), "en", "s1", 0L)) // 9/10 shared
    val got = IndexingQueries.q166(spark, docsDir(rows))
      .select($"doc_id_1", $"doc_id_2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L)))
  }

  test("prefix+position filter stays lossless on a dense random corpus") {
    import spark.implicits._
    // 60 docs over a 40-token vocabulary (deterministic LCG), so many
    // pairs hover near θ — the regime where an off-by-one in the
    // prefix length or position bound silently drops pairs. Compare
    // against the exact O(n²) Jaccard computed in Scala.
    var seed = 12345L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); (seed >>> 33) }
    val docs = (1L to 60L).map { id =>
      val base = (1 to 12).map(_ => s"t${next() % 40}")
      // every third doc mutates the previous doc slightly → near-dups
      (id, base.mkString(" "), "en", "s1", 0L)
    }
    val sets = docs.map { case (id, text, _, _, _) => id -> text.split(" ").toSet }.toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size; un = (sets(a) | sets(b)).size
      if inter * 10 >= un * 9
    } yield (a, b)).toSet
    val got = IndexingQueries.q166(spark, docsDir(docs))
      .select($"doc_id_1", $"doc_id_2").as[(Long, Long)].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("q167 assigns contiguous ids matching the global sort order") {
    import spark.implicits._
    val rows = (1L to 97L).map(i =>
      (i, s"t$i", "en", "s1", (i * 37 % 11) * 100 + i % 7))
    val got = IndexingQueries.q167(spark, docsDir(rows))
      .select($"doc_id", $"n_chars", $"seq_id")
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._3).toSeq == (1L to 97L))
    val expected = rows.sortBy { case (id, _, _, _, n) => (-n, id) }.map(_._1)
    assert(got.sortBy(_._3).map(_._1).toSeq == expected.toSeq)
  }

  test("q168 keeps exactly k-per-source and is stable across runs") {
    import spark.implicits._
    val rows = (1L to 200L).map(i =>
      (i, s"t$i", "en", if (i % 3 == 0) "s3" else s"s${i % 2}", i))
    val dir = docsDir(rows)
    val a = IndexingQueries.q168(spark, dir).collect().map(_.toSeq)
    val b = IndexingQueries.q168(spark, dir).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    val perSource = IndexingQueries.q168(spark, dir)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perSource.values.forall(_ == 10L))
  }

  test("q164 flags the doc with an unseen-elsewhere bigram as rarest") {
    // doc 3 contains a bigram occurring once ("rare pair"); common docs
    // repeat the same bigrams, so their P is higher.
    val common = "the cat sat on the mat"
    val rows = Seq[(Long, String, String, String, Long)](
      (1L, common, "en", "s1", 0L),
      (2L, common, "en", "s1", 0L),
      (3L, s"$common zz qq", "en", "s1", 0L))
    val got = IndexingQueries.q164(spark, docsDir(rows))
      .select(col("doc_id"), col("min_p"), col("rarest_bigram"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val byDoc = got.map(t => t._1 -> t).toMap
    // Doc 3's minimum is strictly below the common docs' minimum, and
    // its rarest bigram is one of its two singletons.
    assert(byDoc(3L)._2 < byDoc(1L)._2)
    assert(Set("mat zz", "zz qq").contains(byDoc(3L)._3))
    assert(byDoc(1L) == byDoc(2L).copy(_1 = 1L))
  }
}
