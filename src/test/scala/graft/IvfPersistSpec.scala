package graft

import java.nio.file.Files

import graft.ml.IvfIndex

/** The ANN index as a persisted artifact (the 100 TB contract: train
  * once, search many, fold deltas in — never re-cluster per query
  * batch). Pins: reopened-index search is hash-identical to
  * fresh-built search; incremental assignment reproduces build-time
  * assignment against the same centroids; an appended delta is
  * immediately searchable through the reopened index.
  */
class IvfPersistSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val sf = "/root/testdata/sf0.01"
  private val nList = 8

  private def queriesOf(emb: org.apache.spark.sql.DataFrame) =
    emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  private def resultKey(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "vec_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("save -> load -> search is identical to fresh-built search") {
    val emb = Tables.embeddings(spark, sf)
    val queries = queriesOf(emb)
    val index = IvfIndex.build(emb, "embedding", nList)
    val fresh = resultKey(IvfIndex.search(index, queries, k = 10, nProbe = 3))

    val dir = Files.createTempDirectory("ivf1").toString
    IvfIndex.save(index, dir)
    val reopened = resultKey(
      IvfIndex.searchPersisted(spark, dir, queries, k = 10, nProbe = 3))
    assert(reopened === fresh,
      "reopened-index search must equal fresh-built search")

    // centroids survived exactly (persistence is lossless)
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.centroids.length === index.centroids.length)
    index.centroids.zip(loaded.centroids).foreach { case ((i0, c0), (i1, c1)) =>
      assert(i0 === i1 && c0.toSeq === c1.toSeq)
    }
  }

  test("filtered search works unchanged through a persisted index") {
    val emb = Tables.embeddings(spark, sf)
    val queries = queriesOf(emb)
    val index = IvfIndex.build(emb, "embedding", nList)
    val dir = Files.createTempDirectory("ivf2").toString
    IvfIndex.save(index, dir)
    val fresh = resultKey(IvfIndex.search(index, queries, k = 10,
      nProbe = nList, predicate = Some(col("label") === 2)))
    val reopened = resultKey(IvfIndex.searchPersisted(spark, dir, queries,
      k = 10, nProbe = nList, predicate = Some(col("label") === 2)))
    assert(reopened === fresh)
  }

  test("assignNew reproduces build-time cell assignment on the same centroids") {
    val emb = Tables.embeddings(spark, sf)
    val index = IvfIndex.build(emb, "embedding", nList)
    // re-assign a slice of the already-assigned corpus: squared-
    // Euclidean argmin must land every vector in its build-time cell
    val slice = emb.filter(col("vec_id") % 7 === 0)
    val re = IvfIndex.assignNew(index, slice, "embedding", "vec_id")
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val orig = index.assigned.filter(col("vec_id") % 7 === 0)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(re.size === orig.size)
    assert(re === orig, "incremental assignment diverged from KMeans.transform")
  }

  test("PQ codebooks: save -> load -> encode and searchADC are identical to fresh") {
    val emb = Tables.embeddings(spark, sf)
    val queries = queriesOf(emb)
    val dim = emb.selectExpr("size(embedding)").head().getInt(0)
    val idx = graft.ml.PqIndex.build(emb, "embedding", dim, m = 8, k = 16)
    val dir = Files.createTempDirectory("pq1").toString
    graft.ml.PqIndex.save(idx, dir)
    val loaded = graft.ml.PqIndex.load(dir)
    assert(loaded.m === idx.m && loaded.subDim === idx.subDim)
    // codebooks survived exactly
    idx.centroids.zip(loaded.centroids).foreach { case (a, b) =>
      a.zip(b).foreach { case (c0, c1) => assert(c0.toSeq === c1.toSeq) }
    }
    val enc = graft.ml.PqIndex.encode(emb, "vec_id", "embedding", idx)
    val encLoaded = graft.ml.PqIndex.encode(emb, "vec_id", "embedding", loaded)
    assert(encLoaded.collect().map(_.toString).sorted.toSeq ===
      enc.collect().map(_.toString).sorted.toSeq, "codes diverged after reload")
    val fresh = graft.ml.PqIndex.searchADC(enc, queries, idx, k = 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reopened = graft.ml.PqIndex.searchADC(encLoaded, queries, loaded, k = 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reopened === fresh)
  }

  test("IVFPQ: save -> searchPersisted is identical to fresh; appendNew folds a delta") {
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val queries = queriesOf(emb)
    val dim = emb.selectExpr("size(embedding)").head().getInt(0)

    val idx = graft.ml.IvfPq.build(base, "vec_id", "embedding", dim,
      nList = 8, m = 8, k = 16, trainSample = 5000)
    val dir = Files.createTempDirectory("ivfpq1").toString
    graft.ml.IvfPq.save(idx, dir)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = key(graft.ml.IvfPq.search(idx, queries, k = 10, nProbe = 3))
    val reopened = key(graft.ml.IvfPq.searchPersisted(spark, dir, queries,
      k = 10, nProbe = 3))
    assert(reopened === fresh, "reopened IVFPQ search diverged")

    graft.ml.IvfPq.appendNew(spark, dir, delta, "vec_id", "embedding")
    val after = graft.ml.IvfPq.load(spark, dir)
    assert(after.encoded.count() === emb.count(),
      "delta codes not appended")
    // the delta really is searchable: with every cell probed, a query
    // ON a delta vector returns k hits (its neighborhood exists)
    val deltaQ = delta.limit(2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val hits = graft.ml.IvfPq.searchPersisted(spark, dir, deltaQ,
      k = 5, nProbe = 8)
    assert(hits.groupBy("q_id").count().collect().forall(_.getLong(1) === 5L))
  }

  test("appendNew folds a delta in; the reopened index searches the union") {
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val queries = queriesOf(emb)

    val index = IvfIndex.build(base, "embedding", nList)
    val dir = Files.createTempDirectory("ivf3").toString
    IvfIndex.save(index, dir)
    IvfIndex.appendNew(spark, dir, delta, "embedding", "vec_id")

    // reference: the same centroids with the union assigned the same way
    val unionAssigned = index.assigned.unionByName(
      IvfIndex.assignNew(index, delta, "embedding", "vec_id")
        .select(index.assigned.columns.map(col).toIndexedSeq: _*))
    val expect = resultKey(IvfIndex.search(
      IvfIndex.Index(index.centroids, unionAssigned), queries, k = 10, nProbe = 3))
    val got = resultKey(
      IvfIndex.searchPersisted(spark, dir, queries, k = 10, nProbe = 3))
    assert(got === expect,
      "appended delta must be searchable exactly as if assigned at build")
    // and the delta's rows really are reachable: with every cell probed,
    // a delta vector queried against itself is its own nearest neighbor
    val deltaQ = delta.filter(col("vec_id") === 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val self = IvfIndex.searchPersisted(spark, dir, deltaQ, k = 1, nProbe = nList)
    // self-match excluded by construction; its nearest OTHER neighbor exists
    assert(self.count() === 1L)
  }
}
