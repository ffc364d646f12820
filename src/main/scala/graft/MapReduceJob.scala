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

  /** Runs the job; returns the output file paths in NN order. */
  def run(spark: SparkSession, spec: JobSpec): Seq[String] = {
    require(spec.numMappers > 0 && spec.numReducers > 0,
      "num_mappers and num_reducers must be positive")
    val mapped = spark.sparkContext
      .textFile(spec.inputDirectory, spec.numMappers)
      .pipe(spec.mapperExecutable)
      .map(splitKV)

    // The reference sorts whole KV lines lexicographically, then
    // groups by key — so partition on the KEY but sort by (key, value)
    // to hand the reducer the exact stream shape it was written for.
    val keyPartitioner = new Partitioner {
      override def numPartitions: Int = spec.numReducers
      override def getPartition(key: Any): Int =
        math.floorMod(key.asInstanceOf[(String, String)]._1.hashCode, numPartitions)
    }
    val reduced = mapped
      .map(kv => (kv, null))
      .repartitionAndSortWithinPartitions(keyPartitioner)
      .map { case ((k, v), _) => s"$k\t$v" }
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

  /** First tab splits key from value (reference line format; the empty
    * key and tab-less lines are both legal mapper output). */
  private def splitKV(line: String): (String, String) = {
    val i = line.indexOf('\t')
    if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
  }
}
