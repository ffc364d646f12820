package graft

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.JsonMethods

/** `submit.py`-compatible entry point: accepts the reference's
  * `new_manager_job` message verbatim (`mapreduce/submit.py:68-76` —
  * `message_type, input_directory, output_directory,
  * mapper_executable, reducer_executable, num_mappers, num_reducers`)
  * and runs it through [[MapReduceJob]]. Where the reference client
  * sends the JSON to a manager socket, here the engine IS the runtime,
  * so the same message arrives as a file argument or on stdin:
  *
  * {{{
  *   echo '{"message_type":"new_manager_job", ...}' | \
  *     sbt "runMain graft.Submit"            # or: graft.Submit job.json
  * }}}
  *
  * Defaults mirror `submit.py`: num_mappers=4, num_reducers=1. The
  * executables are single paths in the message (the reference execs
  * them directly), so they must be executable scripts, exactly as the
  * reference requires.
  */
object Submit {

  /** Parses a `new_manager_job` message into a [[JobSpec]]; rejects
    * any other `message_type` (the reference manager does the same
    * dispatch on this field). */
  def parse(json: String): JobSpec = {
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    val mt = (j \ "message_type").extractOpt[String]
    require(mt.contains("new_manager_job"),
      s"unsupported message_type: ${mt.getOrElse("<absent>")}")
    JobSpec(
      inputDirectory = (j \ "input_directory").extract[String],
      outputDirectory = (j \ "output_directory").extract[String],
      mapperExecutable = Seq((j \ "mapper_executable").extract[String]),
      reducerExecutable = Seq((j \ "reducer_executable").extract[String]),
      numMappers = (j \ "num_mappers").extractOrElse(4),
      numReducers = (j \ "num_reducers").extractOrElse(1))
  }

  def main(args: Array[String]): Unit = {
    val json = args.headOption match {
      case Some(path) => java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      case None => scala.io.Source.stdin.mkString
    }
    val spec = parse(json)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    try {
      val files = MapReduceJob.run(spark, spec)
      // Same submission echo as the reference client (submit.py:91-97).
      println("input directory     " + spec.inputDirectory)
      println("output directory    " + spec.outputDirectory)
      println("mapper executable   " + spec.mapperExecutable.mkString(" "))
      println("reducer executable  " + spec.reducerExecutable.mkString(" "))
      println("num mappers         " + spec.numMappers)
      println("num reducers        " + spec.numReducers)
      files.foreach(f => println("wrote " + f))
    } finally spark.stop()
  }
}
