package graft

import graft.operators.MapReduceParity.Pipes
import org.apache.spark.HashPartitioner
import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Full executable-pipeline parity: map PIPE → key-partitioned
  * key-sorted shuffle → reduce PIPE over the reference's own corpus,
  * compared order-insensitively to the reference golden output —
  * the Spark twin of tests/test_integration_03.py with real
  * subprocesses on both sides of the shuffle.
  */
class PipeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("map-pipe + sorted-shuffle + reduce-pipe reproduces the golden word count") {
    val corpus = TestSpark.resource("corpus")
    val mapped = spark.read.textFile(corpus).rdd
      .pipe(Pipes.wcMap) // M1: wc_map.sh in a real subprocess
      .map { line =>
        val i = line.indexOf('\t')
        (line.substring(0, i), line.substring(i + 1))
      }
    val reduced = mapped
      .repartitionAndSortWithinPartitions(new HashPartitioner(4)) // G1+G3+G4
      .map { case (k, v) => s"$k\t$v" }
      .pipe(Pipes.wcReduce) // R1: wc_reduce.sh in a real subprocess
      .collect()

    val golden = {
      val src = Source.fromResource("golden/word_count_correct.txt")
      try src.getLines().toList finally src.close()
    }
    assert(reduced.sorted.toSeq == golden.sorted)
    assert(reduced.contains("\t9")) // empty key survives both pipes
  }

  test("q_pipe_reduce agrees with q_wordcount (same oracle) on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val viaPipe = SparkEntry.queries("q_pipe_reduce")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaAgg = SparkEntry.queries("q_wordcount")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaPipe == viaAgg)
  }

  test("q_text_sink roundtrip agrees with q_wordcount on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val viaSink = SparkEntry.queries("q_text_sink")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaAgg = SparkEntry.queries("q_wordcount")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSink == viaAgg)
  }
}
