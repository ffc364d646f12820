package graft.streaming

import graft.functions.SimHash60
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingestion — the streaming face of the dedup +
  * text-quality pillars: documents arriving on a stream are quality-
  * filtered, exact-deduplicated by content hash within the watermark,
  * and annotated with the same 60-bit SimHash signature and LSH bands
  * the batch near-dup operators key on (DedupOps.q_dedup_simhash), so
  * a downstream band-keyed join/dedup sees identical keys whether a
  * doc arrived in batch or on the stream.
  *
  * Scale: the quality filter and signature are per-row expression work
  * on the stream; dedup state is one (hash → seen) entry per document
  * inside the 2h watermark — bounded by arrival rate × window, freed
  * by watermark GC, never by history size.
  *
  * Input schema: `ts TIMESTAMP, doc_id, text` from any readStream
  * source.
  */
object DocStream {

  def ingest(docs: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), " ", -1)
    val sig = SimHash60.simhash60(docs.sparkSession, "split(lower(text), ' ', -1)")
    val withSig = docs
      .withWatermark("ts", "2 hours")
      .filter(length(col("text")) >= 50 && size(toks) >= 5)
      .withColumn("content_hash", sha2(col("text"), 256))
      .withColumn("sig", sig)
    // Same 15-bit band slicing as the batch LSH (4 bands over 60 bits).
    val banded = (0 until 4).foldLeft(withSig) { (df, b) =>
      df.withColumn(s"band$b",
        shiftright(col("sig"), b * 15).bitwiseAND(lit((1L << 15) - 1)))
    }
    banded.dropDuplicatesWithinWatermark("content_hash")
  }
}
