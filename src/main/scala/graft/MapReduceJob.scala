package graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.Partitioner
import org.apache.spark.sql.SparkSession

/** The reference's job descriptor, field for field
  * (`mapreduce/submit.py:68-76`: `input_directory, output_directory,
  * mapper_executable, reducer_executable, num_mappers, num_reducers`).
  * Executables are argv vectors (`Seq("sh", "-c", ...)` or a script
  * path) instead of a single path so inline pipelines work too.
  */
final case class JobSpec(
    inputDirectory: String,
    outputDirectory: String,
    mapperExecutable: Seq[String],
    reducerExecutable: Seq[String],
    numMappers: Int = 4,
    numReducers: Int = 1)

/** Drop-in twin of the reference server's whole job pipeline: a user
  * who submits `{input_directory, mapper, reducer, num_mappers,
  * num_reducers, output_directory}` to the reference can hand the same
  * descriptor to [[MapReduceJob.run]] and read the same
  * `outputfileNN` files.
  *
  * Stage mapping (reference → here):
  *  - input split over mappers (`manager/__main__.py:403-434`) →
  *    `textFile(dir, numMappers)` (Spark splits by size, the reference
  *    round-robins whole files; mapper parallelism is an internal
  *    detail with no output contract)
  *  - map via executable (`worker/__main__.py:97-135`) → `RDD.pipe`
  *  - per-worker run sort + k-way heap merge + round-robin key routing
  *    (`worker/__main__.py:163-167`, `manager/__main__.py:436-461`) →
  *    `repartitionAndSortWithinPartitions` over a key-hash
  *    partitioner with whole-line ordering. Both routings satisfy the
  *    actual contract — every distinct key lands in exactly one
  *    reduce partition, key-sorted — but the shuffle is distributed
  *    where the reference merges in one process under a 1 MB budget.
  *  - reduce via executable over key-sorted input
  *    (`worker/__main__.py:137-155`) → `RDD.pipe` per partition
  *  - rename the reducer-output files → `outputfileNN`, NN 1-based zfill(2)
  *    (`manager/__main__.py:489-504`) → same renames via Hadoop
  *    `FileSystem`, so any Spark-supported storage works.
  *
  * Scale: each stage is a plain distributed RDD transform; nothing is
  * collected to the driver, and the only driver-side work is
  * `numReducers` file renames.
  */
object MapReduceJob {

  /** Runs the job; returns the output file paths in NN order.
    *
    * `literalKeyRouting=false` (default) co-locates keys by hash —
    * the contract the reference's own integration tests check
    * (order-insensitive union, every key in exactly one file).
    * `literalKeyRouting=true` reproduces the reference's exact
    * key→file assignment (`manager/__main__.py:454-461`: the i-th
    * distinct key of the globally line-sorted stream goes to file
    * `i % num_reducers`), making each `outputfileNN` byte-identical
    * to the reference's, at the cost of a global sort.
    */
  def run(spark: SparkSession, spec: JobSpec,
      literalKeyRouting: Boolean = false): Seq[String] = {
    require(spec.numMappers > 0 && spec.numReducers > 0,
      "num_mappers and num_reducers must be positive")
    val mapped = spark.sparkContext
      .textFile(spec.inputDirectory, spec.numMappers)
      .pipe(spec.mapperExecutable)
      .map(splitKV)

    val routed =
      if (literalKeyRouting) literalRoute(mapped, spec.numReducers)
      else hashRoute(mapped, spec.numReducers)
    val reduced = routed
      .map { case (k, v) => s"$k\t$v" }
      .pipe(spec.reducerExecutable)

    val out = new HPath(spec.outputDirectory)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new HPath(out, "_reducer-output")
    reduced.saveAsTextFile(staging.toString)
    val parts = fs.listStatus(staging)
      .filter(_.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    val renamed = parts.zipWithIndex.map { case (st, i) =>
      val target = new HPath(out, f"outputfile${i + 1}%02d")
      require(fs.rename(st.getPath, target), s"rename to $target failed")
      target.toString
    }.toSeq
    fs.delete(staging, true)
    renamed
  }

  /** Default routing: partition on the KEY by hash but sort by
    * (key, value) — the reference sorts whole KV lines
    * lexicographically then groups by key, so this hands the reducer
    * the exact stream shape it was written for, with the shuffle
    * distributed where the reference merges in one process.
    */
  private def hashRoute(mapped: org.apache.spark.rdd.RDD[(String, String)],
      numReducers: Int): org.apache.spark.rdd.RDD[(String, String)] = {
    val keyPartitioner = new Partitioner {
      override def numPartitions: Int = numReducers
      override def getPartition(key: Any): Int =
        math.floorMod(key.asInstanceOf[(String, String)]._1.hashCode, numPartitions)
    }
    mapped
      .map(kv => (kv, null))
      .repartitionAndSortWithinPartitions(keyPartitioner)
      .map(_._1)
  }

  /** G4-literal routing (`manager/__main__.py:454-461`): walk the
    * globally line-sorted stream, bump a counter whenever the key
    * changes, route the line to file `counter % num_reducers`. The
    * same assignment without a single-process merge:
    *
    *  1. range-partitioned global sort by (key, value) — Spark's
    *     distributed twin of the reference's `heapq.merge`;
    *  2. one metadata row PER PARTITION to the driver (first/last key
    *     + distinct-key count — O(partitions), never data rows) turns
    *     local key ranks into global ones, subtracting 1 whenever a
    *     key spans a partition boundary so it keeps one counter value;
    *  3. a file-indexed repartition-and-sort delivers each reduce
    *     file's lines in exactly the order the reference's merge
    *     writes them.
    *
    * Keys compare as ASCII here and in the reference (Python str
    * compares code points; the corpus contract is ASCII, see
    * `Pipes.wcMap`).
    */
  private def literalRoute(mapped: org.apache.spark.rdd.RDD[(String, String)],
      numReducers: Int): org.apache.spark.rdd.RDD[(String, String)] = {
    val sorted = mapped.map(kv => (kv, null)).sortByKey().map(_._1)
    val stats = sorted.mapPartitionsWithIndex { (i, it) =>
      var first: String = null
      var last: String = null
      var distinct = 0L
      it.foreach { case (k, _) =>
        if (first == null) first = k
        if (last == null || last != k) distinct += 1
        last = k
      }
      Iterator.single((i, Option(first), Option(last), distinct))
    }.collect().sortBy(_._1)

    // offsets(i) = global rank of partition i's first key. `cum` is
    // the next fresh key's rank; a key continuing across a partition
    // boundary keeps the rank it already has, so it must not bump.
    val offsets = new Array[Long](stats.length)
    var cum = 0L
    var prevLast: Option[String] = None
    stats.foreach { case (i, first, last, distinct) =>
      val shared = (first, prevLast) match {
        case (Some(f), Some(p)) if f == p => 1L
        case _ => 0L
      }
      offsets(i) = cum - shared
      cum = offsets(i) + distinct
      if (last.isDefined) prevLast = last
    }

    val bcOffsets = sorted.sparkContext.broadcast(offsets)
    val indexed = sorted.mapPartitionsWithIndex { (i, it) =>
      var prevKey: String = null
      var rank = bcOffsets.value(i) - 1
      it.map { case (k, v) =>
        if (prevKey == null || prevKey != k) rank += 1
        prevKey = k
        ((rank % numReducers).toInt, (k, v))
      }
    }
    val filePartitioner = new Partitioner {
      override def numPartitions: Int = numReducers
      override def getPartition(key: Any): Int =
        key.asInstanceOf[(Int, (String, String))]._1
    }
    indexed
      .map { case (f, kv) => ((f, kv), null) }
      .repartitionAndSortWithinPartitions(filePartitioner)
      .map(_._1._2)
  }

  /** First tab splits key from value (reference line format; the empty
    * key and tab-less lines are both legal mapper output). */
  private def splitKV(line: String): (String, String) = {
    val i = line.indexOf('\t')
    if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
  }
}
