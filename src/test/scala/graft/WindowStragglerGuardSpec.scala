package graft

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Mechanical guard against the q163/q174 straggler shape: a window
  * partitioned ONLY by known low-cardinality enum keys (event types,
  * sources, priorities, …) applied to an UNCOLLAPSED base relation
  * funnels each group's entire history through one task — fine at
  * sf0.01, a straggler by construction at 100 TB. The scale-safe
  * re-expression is `Ranking.groupRanks` (two-phase rank) or a prior
  * aggregate that collapses the relation to group-domain size; this
  * sweep fails the build when anyone reintroduces the raw shape.
  *
  * "Uncollapsed" = some file-scan leaf is reachable from the window's
  * child without crossing an Aggregate (which bounds rows to the
  * group domain) or a GlobalLimit. Windows with a high-cardinality
  * key anywhere in the partition spec (user_id, doc_id, o_custkey)
  * scale out naturally and are exempt.
  */
class WindowStragglerGuardSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Enum-like keys whose domain does NOT grow with data volume. */
  private val lowCard = Set(
    "event_type", "source", "priority", "lang", "segment",
    "c_mktsegment", "o_orderpriority", "o_orderstatus", "l_returnflag",
    "l_linestatus", "from_type", "to_type", "p_brand", "flag",
    "r_name", "n_name", "is_blocked", "domain")

  private def rawLeafBelow(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => false // collapsed to group-domain size
    case _: GlobalLimit => false // bounded row count
    case _: graft.plans.TopKPerGroupNode => false // bounded to k × groups
    case _: LocalRelation => false // literal in-memory fixture
    case _: OneRowRelation => false
    case l: LeafNode =>
      // file/table scans grow with data; anything else leaf-like
      // (e.g. a streaming memory sink's table) is judged by kind
      l.isInstanceOf[LogicalRelation] ||
        l.getClass.getSimpleName.contains("DataSourceV2")
    case other => other.children.exists(rawLeafBelow)
  }

  test("no window partitioned only by low-cardinality keys over an uncollapsed base relation") {
    val skip = graft.operators.StreamingQueries.all.map(_.name).toSet
    val offenders = SparkEntry.registry.filterNot(q => skip(q.name)).flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.optimizedPlan
      plan.collect {
        case w: Window if w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall {
              case a: AttributeReference => lowCard(a.name.toLowerCase)
              case _ => false
            } && rawLeafBelow(w.child) =>
          val keys = w.partitionSpec.collect {
            case a: AttributeReference => a.name
          }.mkString(",")
          s"${q.name}[$keys]"
      }
    }
    assert(offenders.isEmpty,
      s"low-cardinality window over an uncollapsed relation (use " +
        s"Ranking.groupRanks or pre-aggregate): ${offenders.mkString("; ")}")
  }
}
