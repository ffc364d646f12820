package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The compaction layout property behind q_compact_assets: many
  * file-per-asset inputs become a bounded number of parquet files,
  * losslessly. (The registry query itself is digest-verified against
  * the DuckDB oracle; this spec pins the file-count contract the
  * oracle cannot see.)
  */
class CompactionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("compaction bounds the file count and preserves every payload") {
    val assetDir = Files.createTempDirectory("graft-compact-in")
    val payloads = (0 until 40).map(i => i.toLong -> s"payload-$i".getBytes("UTF-8"))
    payloads.foreach { case (id, bytes) =>
      Files.write(assetDir.resolve(f"doc$id%06d.bin"), bytes)
    }
    val outDir = Files.createTempDirectory("graft-compact-out").toString

    spark.read.format("binaryFile").load(assetDir.toString)
      .select(regexp_extract(col("path"), "doc(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("content"))
      .repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(outDir)

    val partFiles = Paths.get(outDir).toFile.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(partFiles.length == 4, s"expected 4 compacted files, got ${partFiles.length}")

    val back = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("content").toSeq).toMap
    assert(back == payloads.map { case (id, b) => id -> b.toSeq }.toMap)
  }
}
