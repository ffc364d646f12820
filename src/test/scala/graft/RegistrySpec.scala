package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static invariants of the driver contract. These fail fast on
  * authoring mistakes the runtime would swallow silently — above all
  * duplicate query names, which `toMap` would dedupe by dropping an
  * implementation without any error.
  */
class RegistrySpec extends AnyFunSuite {

  private val modules: Seq[(String, Seq[Q])] = Seq(
    "MapReduceParity" -> operators.MapReduceParity.all,
    "Relational" -> operators.Relational.all,
    "EventsOps" -> operators.EventsOps.all,
    "DedupOps" -> operators.DedupOps.all,
    "AnnOps" -> operators.AnnOps.all,
    "TextOps" -> operators.TextOps.all,
    "MultimodalOps" -> operators.MultimodalOps.all,
    "GraphOps" -> operators.GraphOps.all,
    "StreamOps" -> streaming.StreamOps.all,
  )

  test("query names are globally unique (toMap must not drop any)") {
    val names = modules.flatMap(_._2).map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    assert(SparkEntry.queries.size == names.length)
  }

  test("every oracle belongs to a registered query") {
    val qnames = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qnames)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query names its table and carries a scale note") {
    modules.foreach { case (m, qs) =>
      qs.foreach { q =>
        assert(q.name.startsWith("q_") || q.name == "q1_agg", s"$m/${q.name}")
        assert(q.doc.nonEmpty, s"$m/${q.name} missing scale note")
      }
    }
  }

  test("oracle SQL never references an absent table") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      assert(tables.exists(t => lower.contains(t)),
        s"$name oracle references no known table")
    }
  }
}
