package graft

/** Registry-wide guard against unbounded cartesian joins: a
  * CartesianProduct whose sides both grow with data volume is the
  * one shape no amount of partitioning saves at 100 TB. Every
  * intentional cross join in the registry broadcasts a tiny/1-row
  * aggregate (planning to BroadcastNestedLoopJoin, which is fine at
  * any scale when one side is a scalar grid); a plain
  * CartesianProduct in a PHYSICAL plan means someone forgot the
  * broadcast() and Spark fell back to the n×m shuffle. Sweeps every
  * registered query's executed plan, like the bucket-self-join and
  * window-straggler guards.
  */
class CartesianGuardSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    val skip = graft.operators.StreamingQueries.all.map(_.name).toSet
    val offenders = SparkEntry.registry.filterNot(q => skip(q.name))
      .flatMap { q =>
        val p = q.fn(spark, sf).queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(q.name) else None
      }
    assert(offenders.isEmpty,
      "CartesianProduct planned (add broadcast() to the small side):\n" +
        offenders.mkString("\n"))
  }
}
