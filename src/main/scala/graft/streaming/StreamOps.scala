package graft.streaming

import graft.{Q, Tables}
import graft.operators.{DedupOps, Scratch}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-visible streaming queries — the streaming pillar's first
  * CORRECTNESS rows (until round 5 it was sbt-only: MemoryStream
  * suites with no DuckDB oracle).
  *
  * The trick that makes a stream oracle-checkable: run the REAL
  * Structured Streaming pipeline (file source → stateful dedup →
  * parquet sink, `Trigger.AvailableNow`) over the same parquet the
  * batch tables read, and emit only columns that are pure functions of
  * the surviving row's text — then "which duplicate arrived first" (a
  * race in any streaming dedup) cannot affect a single output byte,
  * and the oracle is the batch twin's SQL.
  */
object StreamOps {

  val all: Seq[Q] = Seq(
    Q(
      "q_stream_ingest",
      "streaming corpus ingestion run END-TO-END as a real Structured " +
        "Streaming job (file source → DocStream.ingest quality filter " +
        "+ watermarked exact dedup + SimHash banding → parquet sink, " +
        "AvailableNow): the driver row proves stream output ≡ batch " +
        "semantics, not just that a stream runs. Output columns are " +
        "all functions of the surviving text (content hash, 60-bit " +
        "SimHash, 4 LSH bands), so dedup arrival order can't leak in. " +
        "Scale: per-row expression work on the stream; dedup state is " +
        "one hash per doc inside the 2h watermark, freed by watermark " +
        "GC; the file source at 100 TB is the same code over a bucket " +
        "listing, micro-batch size capped by maxFilesPerTrigger",
      Some(
        s"""WITH kept AS (
           |  SELECT DISTINCT text FROM documents
           |  WHERE length(text) >= 50
           |    AND len(string_split(lower(text), ' ')) >= 5
           |), tok AS (
           |  SELECT text, unnest(string_split(lower(text), ' ')) AS w FROM kept
           |), h AS (
           |  SELECT text, CAST('0x'||substr(md5(w),1,15) AS BIGINT) AS h FROM tok
           |), bits AS (
           |  SELECT text, ${DedupOps.simhashSqlBits} FROM h GROUP BY text
           |), sim AS (
           |  SELECT sha256(text) AS content_hash,
           |    ${DedupOps.simhashSqlAssemble} AS sig FROM bits
           |)
           |SELECT content_hash, sig,
           |  (sig >> 0) & 32767 AS band0,
           |  (sig >> 15) & 32767 AS band1,
           |  (sig >> 30) & 32767 AS band2,
           |  (sig >> 45) & 32767 AS band3
           |FROM sim ORDER BY content_hash""".stripMargin),
    ) { (s, dir) =>
      val schema = Tables.documents(s, dir).schema
      // The documents table has no event time; a pinned literal ts
      // keeps every doc inside one watermark window, which is exactly
      // the "bounded replay of a batch table" contract AvailableNow
      // models. A live deployment reads real arrival timestamps here.
      // The testdata table is a single parquet file, not a directory.
      // The file source forces basePath = path unless the path is a
      // glob (FileStreamSource.optionsWithPartitionBasePath), and a
      // file basePath is rejected — so glob the one file and pin
      // basePath to the table root explicitly.
      val src = s.readStream.schema(schema)
        .option("basePath", dir)
        .parquet(s"$dir/documents.parquet*")
        .withColumn("ts", lit("2026-01-01 00:00:00").cast("timestamp"))
      val out = DocStream.ingest(src)
        .select("content_hash", "sig", "band0", "band1", "band2", "band3")
      val scratch = Scratch.dir()
      val q = out.writeStream
        .format("parquet")
        .option("path", s"$scratch/out")
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$scratch/out").orderBy("content_hash")
    },
  )
}
