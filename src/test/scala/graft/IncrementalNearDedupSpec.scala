package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of q_dedup_near_incremental: probing the persisted base
  * band index with only the new batch must find EXACTLY the pairs a
  * full-corpus two-stage near-dedup (q_dedup_rescored) finds among
  * pairs touching the batch — no candidate lost to the index
  * round-trip, none invented — and the candidate generator must
  * exercise both pair classes (base–batch via the index probe,
  * batch–batch via the self-join side).
  */
class IncrementalNearDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[(Long, Long, Double)] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted

  test("incremental == full-corpus rescored near-dedup restricted to batch-touching pairs") {
    val incremental = rows("q_dedup_near_incremental")
    val fullTouching = rows("q_dedup_rescored").filter(_._2 >= 400L)
    assert(incremental.nonEmpty, "test corpus yields no batch-touching near-dup pairs")
    assert(incremental === fullTouching)
  }

  test("both pair classes survive: index probe (base-batch) and batch self-join (batch-batch)") {
    val incremental = rows("q_dedup_near_incremental")
    assert(incremental.exists(_._1 < 400L),
      "no base-batch pair — the persisted index probe found nothing")
    assert(incremental.exists(_._1 >= 400L),
      "no batch-batch pair — the batch self-join side found nothing")
  }

  test("incremental cluster maintenance equals the full recompute, and merges across the boundary") {
    def clusters(name: String): Seq[(Long, Long, Long)] =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val incremental = clusters("q_dedup_cluster_incremental")
    val full = clusters("q_dedup_cluster")
    assert(incremental.nonEmpty)
    assert(incremental === full,
      "label-star merge diverged from the full-corpus recompute")
    // The merge must actually unite yesterday's clusters with batch
    // docs — a cluster canonicalized in the base whose members now
    // include a batch doc.
    assert(incremental.exists { case (cid, _, maxDoc) => cid < 400L && maxDoc >= 400L },
      "no cluster spans the base/batch boundary — the merge path is untested by this corpus")
  }
}
