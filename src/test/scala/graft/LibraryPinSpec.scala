package graft

import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.regression.IsotonicRegression
import org.apache.spark.sql.functions._

/** Library-semantics pinning (the q245-q247 discipline applied where
  * an oracle can't be SQL): MLlib's distributed solvers checked
  * against exact in-repo references of their own definitions. */
class LibraryPinSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential pool-adjacent-violators: the textbook definition of
    * the (unique) L2 isotonic fit. Returns fitted value per input
    * index (inputs already sorted by feature). */
  private def pava(y: Array[Double], w: Array[Double]): Array[Double] = {
    case class Block(var sum: Double, var weight: Double, var n: Int) {
      def mean: Double = sum / weight
    }
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    for (i <- y.indices) {
      blocks += Block(y(i) * w(i), w(i), 1)
      while (blocks.length >= 2 &&
        blocks(blocks.length - 2).mean >= blocks.last.mean) {
        val b = blocks.remove(blocks.length - 1)
        blocks.last.sum += b.sum
        blocks.last.weight += b.weight
        blocks.last.n += b.n
      }
    }
    blocks.flatMap(b => Array.fill(b.n)(b.mean)).toArray
  }

  test("MLlib IsotonicRegression equals sequential PAVA (unique L2 fit)") {
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 3) {
      val n = 200
      // noisy increasing trend with plateaus and inversions
      val xs = (0 until n).map(_.toDouble).toArray
      val ys = xs.map(x => x / 40.0 + rnd.nextGaussian() * 1.5)
      val df = xs.zip(ys).toSeq.toDF("feature", "label")
        .select($"label", $"feature", lit(1.0).as("weight"))
      val model = new IsotonicRegression()
        .setFeaturesCol("feature").setLabelCol("label").setWeightCol("weight")
        .fit(df.repartition(7)) // force the distributed merge path
      val fitted = model.transform(xs.toSeq.toDF("feature"))
        .orderBy($"feature").collect().map(_.getDouble(1))
      val ref = pava(ys, Array.fill(n)(1.0))
      val maxDiff = fitted.zip(ref).map { case (a, b) => math.abs(a - b) }.max
      assert(maxDiff < 1e-9,
        s"trial $trial: MLlib isotonic deviates from exact PAVA by $maxDiff")
      // monotone by construction
      assert(fitted.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    }
  }

  test("MLlib MinHashLSH approx join: recall floor vs exact Jaccard, no false zero-distance") {
    val rnd = new scala.util.Random(11)
    val vocab = 200
    def randSet(): Set[Int] = (0 until 30).map(_ => rnd.nextInt(vocab)).toSet
    // pairs of near-dups (90% overlap) + unrelated noise
    val base = (0 until 20).map(_ => randSet())
    val rows = base.zipWithIndex.flatMap { case (s0, i) =>
      val mutated = s0.take(s0.size - 2) ++ Seq(vocab + i) // high overlap
      Seq((i.toLong * 2, s0), (i.toLong * 2 + 1, mutated.toSet))
    }
    def toVec(s: Set[Int]) =
      Vectors.sparse(vocab + 40, s.toSeq.sorted.map(i => (i, 1.0)))
    val df = rows.map { case (id, s) => (id, toVec(s)) }.toDF("id", "features")
    val lsh = new MinHashLSH().setNumHashTables(8).setSeed(7)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(df)
    val joined = model.approxSimilarityJoin(df, df, 0.5, "jaccardDist")
      .select(col("datasetA.id").as("a"), col("datasetB.id").as("b"),
        col("jaccardDist"))
      .filter($"a" < $"b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def jaccard(x: Set[Int], y: Set[Int]): Double =
      (x & y).size.toDouble / (x | y).size
    val truePairs = rows.combinations(2).collect {
      case Seq((ia, sa), (ib, sb)) if jaccard(sa, sb) >= 0.8 =>
        (math.min(ia, ib), math.max(ia, ib))
    }.toSet
    assert(truePairs.nonEmpty)
    // recall on the planted high-similarity pairs
    val found = truePairs.count(joined.contains)
    assert(found.toDouble / truePairs.size >= 0.9,
      s"recall ${found.toDouble / truePairs.size} below floor")
    // every reported distance must match exact Jaccard distance
    joined.foreach { case ((a, b), dist) =>
      val sa = rows.find(_._1 == a).get._2
      val sb = rows.find(_._1 == b).get._2
      assert(math.abs(dist - (1.0 - jaccard(sa, sb))) < 1e-12,
        s"pair ($a,$b): library distance $dist != exact")
    }
  }
}
