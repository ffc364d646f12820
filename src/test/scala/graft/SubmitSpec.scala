package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions
import scala.io.Source

/** Feeds [[Submit]] the reference's exact `new_manager_job` JSON shape
  * (`mapreduce/submit.py:68-76`) — executables as single script paths,
  * snake_case fields — and checks the `outputfileNN` contents against
  * the golden word count, i.e. the full submit→run→output contract a
  * reference user exercises.
  */
class SubmitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def script(body: String): String = {
    val p: Path = Files.createTempFile("graft-exec", ".sh")
    Files.writeString(p, "#!/bin/sh\n" + body + "\n")
    Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
    p.toString
  }

  test("new_manager_job JSON runs the word-count job to golden outputs") {
    val mapper = script(
      """LC_ALL=C tr '[ \t]' '\n' | LC_ALL=C tr '[:upper:]' '[:lower:]' | awk '{print $1"\t1"}'""")
    val reducer = script("""cut -f1 | uniq -c | awk '{print $2"\t"$1}'""")
    val outDir = Files.createTempDirectory("graft-submit").toString
    val json =
      s"""{
         |  "message_type": "new_manager_job",
         |  "input_directory": "${TestSpark.resource("corpus")}",
         |  "output_directory": "$outDir",
         |  "mapper_executable": "$mapper",
         |  "reducer_executable": "$reducer",
         |  "num_mappers": 4,
         |  "num_reducers": 2
         |}""".stripMargin

    val spec = Submit.parse(json)
    assert(spec.numMappers == 4 && spec.numReducers == 2)
    val files = MapReduceJob.run(spark, spec)
    assert(files.map(_.split('/').last) == Seq("outputfile01", "outputfile02"))

    val out = files.flatMap { f =>
      val src = Source.fromFile(f)
      try src.getLines().toList finally src.close()
    }
    val golden = {
      val src = Source.fromResource("golden/word_count_correct.txt")
      try src.getLines().toList finally src.close()
    }
    assert(out.sorted == golden.sorted)
  }

  test("defaults and dispatch match submit.py") {
    // num_mappers/num_reducers omitted → the client's defaults (4, 1).
    val spec = Submit.parse(
      """{"message_type": "new_manager_job",
        |"input_directory": "/in", "output_directory": "/out",
        |"mapper_executable": "/bin/cat", "reducer_executable": "/bin/cat"}""".stripMargin)
    assert(spec == JobSpec("/in", "/out", Seq("/bin/cat"), Seq("/bin/cat"), 4, 1))
    // Any other message_type is rejected, like the manager's dispatch.
    val e = intercept[IllegalArgumentException] {
      Submit.parse("""{"message_type": "shutdown"}""")
    }
    assert(e.getMessage.contains("message_type"))
  }
}
