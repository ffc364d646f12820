package graft

import graft.operators.MapReduceParity.Pipes
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.io.Source

/** Drives [[MapReduceJob]] with the reference's own job shape (word
  * count over its public test corpus, num_mappers=4, num_reducers=2)
  * and checks the reference's observable contract: `outputfileNN`
  * names, every distinct key in exactly one file, and the union of
  * files equal (order-insensitively) to the reference golden output —
  * the comparison `tests/test_integration_03.py:82-92` makes.
  */
class MapReduceJobSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("word-count job reproduces the reference golden outputs") {
    val outDir = Files.createTempDirectory("graft-mrjob").toString
    val files = MapReduceJob.run(spark, JobSpec(
      inputDirectory = TestSpark.resource("corpus"),
      outputDirectory = outDir,
      mapperExecutable = Pipes.wcMap,
      reducerExecutable = Pipes.wcReduce,
      numMappers = 4,
      numReducers = 2))

    assert(files.map(_.split('/').last) == Seq("outputfile01", "outputfile02"))

    val perFile = files.map { f =>
      val src = Source.fromFile(f)
      try src.getLines().toList finally src.close()
    }
    // Each distinct key lands in exactly one output file.
    val keySets = perFile.map(_.map(_.split('\t').head).toSet)
    assert(keySets.head.intersect(keySets(1)).isEmpty)

    val golden = {
      val src = Source.fromResource("golden/word_count_correct.txt")
      try src.getLines().toList finally src.close()
    }
    assert(perFile.flatten.sorted == golden.sorted)
    assert(perFile.flatten.contains("\t9")) // the empty key survives
  }

  test("wc job agrees with the declarative plan on a seeded random corpus") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("Alpha", "beta", "GAMMA", "delta", "x1", "Y2", "")
    val lines = Seq.fill(300) {
      Seq.fill(rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" ")
    }
    val inDir = Files.createTempDirectory("graft-mrjob-rand-in")
    Files.write(inDir.resolve("part0"),
      lines.mkString("\n").getBytes("UTF-8"))
    val outDir = Files.createTempDirectory("graft-mrjob-rand-out").toString

    val files = MapReduceJob.run(spark, JobSpec(
      inputDirectory = inDir.toString,
      outputDirectory = outDir,
      mapperExecutable = Pipes.wcMap,
      reducerExecutable = Pipes.wcReduce,
      numMappers = 3,
      numReducers = 4))
    val viaJob = files.flatMap { f =>
      val src = Source.fromFile(f)
      try src.getLines().toList finally src.close()
    }.sorted

    val viaPlan = spark.read.text(inDir.toString)
      .select(explode(split(lower(col("value")), "[ \t]", -1)).as("word"))
      .groupBy("word").count()
      .collect()
      .map(r => s"${r.getString(0)}\t${r.getLong(1)}")
      .toSeq.sorted
    assert(viaJob == viaPlan)
  }

  test("literal routing reproduces the reference's exact per-file layout") {
    import org.apache.spark.sql.functions._
    val outDir = Files.createTempDirectory("graft-mrjob-literal").toString
    val files = MapReduceJob.run(spark, JobSpec(
      inputDirectory = TestSpark.resource("corpus"),
      outputDirectory = outDir,
      mapperExecutable = Pipes.wcMap,
      reducerExecutable = Pipes.wcReduce,
      numMappers = 4,
      numReducers = 3), literalKeyRouting = true)
    val perFile = files.map { f =>
      val src = Source.fromFile(f)
      try src.getLines().toList finally src.close()
    }

    // Oracle: the reference's merge routing (manager/__main__.py:454-461)
    // simulated directly — the i-th distinct key of the sorted stream
    // goes to file i % R; the wc reducer then emits one `key\tcount`
    // line per key in stream (= sorted) order.
    val counts = spark.read.text(TestSpark.resource("corpus"))
      .select(explode(split(lower(col("value")), "[ \t]", -1)).as("word"))
      .groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sortedKeys = counts.keys.toSeq.sorted
    val expected = (0 until 3).map { f =>
      sortedKeys.zipWithIndex
        .collect { case (k, i) if i % 3 == f => s"$k\t${counts(k)}" }
        .toList
    }
    // Byte-identical per-file contents, not just the union.
    assert(perFile == expected)
  }

  test("literal routing survives keys spanning sort-partition boundaries") {
    import org.apache.spark.sql.functions._
    // Tiny alphabet + many mappers ⇒ every key's run crosses range
    // partition boundaries in the global sort, exercising the
    // shared-boundary-key offset adjustment.
    val rnd = new scala.util.Random(11)
    val alphabet = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val lines = Seq.fill(400) {
      Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" ")
    }
    val inDir = Files.createTempDirectory("graft-mrjob-span-in")
    Files.write(inDir.resolve("part0"), lines.mkString("\n").getBytes("UTF-8"))
    val outDir = Files.createTempDirectory("graft-mrjob-span-out").toString
    val files = MapReduceJob.run(spark, JobSpec(
      inputDirectory = inDir.toString,
      outputDirectory = outDir,
      mapperExecutable = Pipes.wcMap,
      reducerExecutable = Pipes.wcReduce,
      numMappers = 5,
      numReducers = 3), literalKeyRouting = true)
    val perFile = files.map { f =>
      val src = Source.fromFile(f)
      try src.getLines().toList finally src.close()
    }
    val counts = spark.read.text(inDir.toString)
      .select(explode(split(lower(col("value")), "[ \t]", -1)).as("word"))
      .groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sortedKeys = counts.keys.toSeq.sorted
    val expected = (0 until 3).map { f =>
      sortedKeys.zipWithIndex
        .collect { case (k, i) if i % 3 == f => s"$k\t${counts(k)}" }
        .toList
    }
    assert(perFile == expected)
  }

  test("grep job reproduces grep_correct.txt through the same API") {
    val outDir = Files.createTempDirectory("graft-mrjob-grep").toString
    val files = MapReduceJob.run(spark, JobSpec(
      inputDirectory = TestSpark.resource("corpus"),
      outputDirectory = outDir,
      mapperExecutable = Pipes.grepMap,
      reducerExecutable = Pipes.grepReduce,
      numMappers = 4,
      numReducers = 1))
    assert(files.map(_.split('/').last) == Seq("outputfile01"))
    val out = {
      val src = Source.fromFile(files.head)
      try src.getLines().toList finally src.close()
    }
    val golden = {
      val src = Source.fromResource("golden/grep_correct.txt")
      try src.getLines().toList finally src.close()
    }
    assert(out.sorted == golden.sorted)
  }

  test("two queued jobs run back-to-back, each into its own output dir (C2 FIFO)") {
    // The reference's two-queued-jobs shape (tests/test_manager_04.py:
    // 23-58): a second new_manager_job submitted while the first is
    // queued; the manager runs them IN ORDER into output0/output1.
    // Here the FIFO is the calling thread — MapReduceJob.run returns
    // only when its job is complete, so sequential calls ARE the
    // reference's queue discipline (Spark's scheduler replaces the
    // manager's C2 queue, per SURVEY §2.7) — and the observable
    // contract is the same: both output directories exist afterward
    // with their own complete, golden-matching outputs (wc then grep,
    // exercising DIFFERENT executables to catch any state bleed
    // between queued jobs).
    val out0 = Files.createTempDirectory("graft-mrjob-fifo0").toString
    val out1 = Files.createTempDirectory("graft-mrjob-fifo1").toString
    val files0 = MapReduceJob.run(spark, JobSpec(
      inputDirectory = TestSpark.resource("corpus"),
      outputDirectory = out0,
      mapperExecutable = Pipes.wcMap,
      reducerExecutable = Pipes.wcReduce,
      numMappers = 2,
      numReducers = 1))
    val files1 = MapReduceJob.run(spark, JobSpec(
      inputDirectory = TestSpark.resource("corpus"),
      outputDirectory = out1,
      mapperExecutable = Pipes.grepMap,
      reducerExecutable = Pipes.grepReduce,
      numMappers = 2,
      numReducers = 1))
    assert(files0.map(_.split('/').last) == Seq("outputfile01"))
    assert(files1.map(_.split('/').last) == Seq("outputfile01"))
    assert(files0.head.startsWith(out0) && files1.head.startsWith(out1))
    def lines(f: String): List[String] = {
      val src = Source.fromFile(f); try src.getLines().toList finally src.close()
    }
    def golden(name: String): List[String] = {
      val src = Source.fromResource(s"golden/$name")
      try src.getLines().toList finally src.close()
    }
    // Job 0's output must still golden-match AFTER job 1 completed —
    // the second job must not have touched the first job's directory.
    assert(lines(files1.head).sorted == golden("grep_correct.txt").sorted)
    assert(lines(files0.head).sorted == golden("word_count_correct.txt").sorted)
  }
}
