package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** The reference engine's own query surface, re-expressed Spark-first.
  *
  * The reference (see SURVEY.md §2) is a Hadoop-Streaming-style
  * MapReduce server whose fixed pipeline is scan → map(executable) →
  * sort → merge-group → reduce(executable). Its two shipped queries are
  * word count (`tests/testdata/exec/wc_map.sh:12`,
  * `wc_reduce.sh:14`) and grep (`tests/testdata/exec/grep_map.py:12-28`,
  * `grep_reduce.py:14-27`). Here each stage capability becomes a
  * declarative DataFrame plan so Catalyst plans the shuffle:
  *
  *  - map/flatMap (M2)            → `explode(split(...))` projection
  *  - filter map (M3)             → `filter(contains)` + projection
  *  - sort phase (G1+G3)          → global `orderBy` (range-partitioned
  *                                  sort, spills via ExternalSorter)
  *  - merge-group + reduce (G4+R2)→ `groupBy(key).agg(...)` (partial
  *                                  map-side aggregation + final hash
  *                                  agg — strictly better than the
  *                                  reference's single-process merge,
  *                                  `mapreduce/manager/__main__.py:436-461`)
  *
  * Scale: word count over 100 TB is a single shuffle keyed by token
  * with map-side combine; cardinality = vocabulary size, so the reduce
  * side is tiny regardless of input size. Grep is shuffle-free: a
  * scan + pushed filter that prunes to two columns.
  */
object MapReduceParity {

  /** Reference tokenizer (wc_map.sh): split on separators, lowercase,
    * keep empty tokens. The testdata corpus is space-separated, so the
    * portable definition both engines share is split on single space.
    */
  private val tokens = split(lower(col("text")), " ", -1)

  private val tokensSql = "unnest(string_split(lower(text), ' '))"

  /** The reference executables as inline shell, shared with the test
    * suite (PipeSpec runs the full map-pipe → sort → reduce-pipe
    * pipeline over the golden corpus).
    */
  object Pipes {
    /** wc_map.sh:12 — tokenize, lowercase, emit `word\t1` (LC_ALL=C
      * pins tr to ASCII so the subprocess agrees with the oracle's
      * `lower()` on this corpus; the ASCII-only contract is the
      * reference's own). */
    val wcMap: Seq[String] =
      Seq("sh", "-c", """LC_ALL=C tr '[ \t]' '\n' | LC_ALL=C tr '[:upper:]' '[:lower:]' | awk '{print $1"\t1"}'""")

    /** wc_reduce.sh:14 — key-sorted input, `cut | uniq -c` per-key
      * count, emit `word\ttotal`. */
    val wcReduce: Seq[String] =
      Seq("sh", "-c", """cut -f1 | uniq -c | awk '{print $2"\t"$1}'""")

    /** grep_map.py:12-28 — strip, drop empty lines, emit `1\tline`
      * when the lowercased line contains the query ("product"). */
    val grepMap: Seq[String] = Seq("sh", "-c",
      """LC_ALL=C awk '{gsub(/^[ \t\r]+|[ \t\r]+$/, ""); if ($0 != "" && index(tolower($0), "product")) print "1\t"$0}'""")

    /** grep_reduce.py:14-27 — print the value field of well-formed
      * `key\tvalue` lines. */
    val grepReduce: Seq[String] =
      Seq("sh", "-c", """LC_ALL=C awk -F'\t' 'NF==2 {print $2}'""")
  }

  val all: Seq[Q] = Seq(
    Q(
      "q_wordcount",
      "reference flagship (M2+G+R2): one shuffle keyed by token, " +
        "map-side combine makes reduce input ~vocabulary-sized at any data scale",
      Some(
        s"""SELECT word, count(*) AS cnt
           |FROM (SELECT $tokensSql AS word FROM documents)
           |GROUP BY word ORDER BY word""".stripMargin),
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(tokens).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy("word")
    },

    Q(
      "q_grep",
      "reference grep (M3+R3): shuffle-free scan; substring predicate and " +
        "2-column projection both push into the parquet reader",
      Some(
        """SELECT doc_id, text FROM documents
          |WHERE contains(lower(text), 'merge') ORDER BY doc_id""".stripMargin),
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .filter(lower(col("text")).contains("merge"))
        .select("doc_id", "text")
        .orderBy("doc_id")
    },

    Q(
      "q_sort_global",
      "reference sort phase (G1+G3): global orderBy = range partitioning " +
        "(sampled bounds) + per-partition spill sort; no single-node merge",
      Some("SELECT doc_id, text FROM documents ORDER BY text, doc_id"),
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select("doc_id", "text")
        .orderBy(col("text"), col("doc_id"))
    },

    Q(
      "q_distinct_keys",
      "reference G4 key-change counter ≡ countDistinct; at scale prefer " +
        "approx_count_distinct (HLL, no exact-distinct shuffle)",
      Some(
        s"""SELECT count(DISTINCT word) AS n_keys
           |FROM (SELECT $tokensSql AS word FROM documents)""".stripMargin),
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(tokens).as("word"))
        .agg(countDistinct(col("word")).as("n_keys"))
    },

    Q(
      "q_pipe_wordcount",
      "reference M1/R1 executable contract: RDD.pipe streams lines through " +
        "a real subprocess per partition (Hadoop-Streaming parity); " +
        "downstream agg is a normal keyed shuffle",
      Some(
        s"""SELECT word, count(*) AS cnt
           |FROM (SELECT $tokensSql AS word FROM documents)
           |GROUP BY word ORDER BY word""".stripMargin),
    ) { (s, dir) =>
      import s.implicits._
      // wc_map.sh parity: tokenize via a streaming executable, one
      // token per line (empty tokens preserved, like the reference's
      // golden output which counts the empty key). The executable both
      // splits AND lowercases — matching wc_map.sh's `tr A-Z a-z` — so
      // the query agrees with its oracle on mixed-case corpora too.
      val mapped = Tables.documents(s, dir)
        .select(col("text")).as[String].rdd
        .pipe(Seq("sh", "-c", "LC_ALL=C tr ' ' '\\n' | LC_ALL=C tr '[:upper:]' '[:lower:]'"))
      s.createDataset(mapped)
        .toDF("word")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy("word")
    },

    Q(
      "q_pipe_reduce",
      "reference R1 full parity: the reduce side is a real executable " +
        "over key-partitioned, KEY-SORTED input " +
        "(repartitionAndSortWithinPartitions = the reference's sort + " +
        "merge-group contract, mapreduce/worker/__main__.py:137-155); " +
        "uniq -c only works because each partition is key-sorted",
      Some(
        s"""SELECT word, count(*) AS cnt
           |FROM (SELECT $tokensSql AS word FROM documents)
           |GROUP BY word ORDER BY word""".stripMargin),
    ) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.HashPartitioner
      // Map phase: tokenize in Spark (M2's idiomatic twin); the parity
      // point of THIS query is the reduce contract.
      val keyed = Tables.documents(s, dir)
        .select(explode(tokens).as("word")).as[String].rdd
        .map(w => (w, 1))
      // G1+G3+G4: key co-location AND within-partition key order —
      // exactly what the reference guarantees a reducer executable.
      val sorted = keyed
        .repartitionAndSortWithinPartitions(new HashPartitioner(s.sparkContext.defaultParallelism))
      val reduced = sorted
        .map { case (w, one) => s"$w\t$one" }
        .pipe(Pipes.wcReduce)
        .map { line =>
          val i = line.indexOf('\t')
          (line.substring(0, i), line.substring(i + 1).toLong)
        }
      s.createDataset(reduced)
        .toDF("word", "cnt")
        .orderBy("word")
    },

    Q(
      "q_text_sink",
      "reference S1+S3 literally: documents.text written as a raw text " +
        "directory, re-scanned with spark.read.text, word-counted, " +
        "written as num_reducers tab-separated files (the outputfileNN " +
        "contract, mapreduce/manager/__main__.py:489-504), read back " +
        "and returned — the oracle cross-checks the whole roundtrip",
      Some(
        s"""SELECT word, count(*) AS cnt
           |FROM (SELECT $tokensSql AS word FROM documents)
           |GROUP BY word ORDER BY word""".stripMargin),
    ) { (s, dir) =>
      val scratch = Scratch.dir()
      val textDir = s"$scratch/input"
      val outDir = s"$scratch/output"
      // S3 stage 0: corpus as a plain-text directory (one line per doc).
      Tables.documents(s, dir).select("text").write.text(textDir)
      // S1: raw text scan; M2+R2: wordcount over the line column.
      val counted = s.read.text(textDir)
        .select(explode(split(lower(col("value")), " ", -1)).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      // S3: num_reducers=2 tab-separated output files.
      counted.repartition(2).write
        .option("sep", "\t").option("emptyValue", "")
        .csv(outDir)
      // Read the sink back so the driver's oracle verifies the files.
      s.read.schema("word STRING, cnt LONG")
        .option("sep", "\t").option("emptyValue", "")
        .csv(outDir)
        .na.fill("", Seq("word"))
        .orderBy("word")
    },

    Q(
      "q_mr_job",
      "the whole reference job pipeline behind one call: documents as " +
        "a text dir → graft.MapReduceJob.run (map executable → " +
        "key-sorted shuffle → reduce executable → outputfileNN " +
        "renames) → sink files read back; the oracle re-derives the " +
        "word count relationally, so the gate checks the full job " +
        "contract end to end",
      Some(
        s"""SELECT word, count(*) AS cnt
           |FROM (SELECT $tokensSql AS word FROM documents)
           |GROUP BY word ORDER BY word""".stripMargin),
    ) { (s, dir) =>
      val scratch = Scratch.dir()
      val textDir = s"$scratch/input"
      val outDir = s"$scratch/output"
      Tables.documents(s, dir).select("text").write.text(textDir)
      graft.MapReduceJob.run(s, graft.JobSpec(
        inputDirectory = textDir,
        outputDirectory = outDir,
        mapperExecutable = Pipes.wcMap,
        reducerExecutable = Pipes.wcReduce,
        numMappers = 4,
        numReducers = 2))
      s.read.schema("word STRING, cnt LONG")
        .option("sep", "\t").option("emptyValue", "")
        .csv(outDir)
        .na.fill("", Seq("word"))
        .orderBy("word")
    },

    Q(
      "q_partitioned_sink",
      "hive-style partitioned parquet sink (partitionBy lang), re-read " +
        "with a partition filter: only the lang=en directory is listed " +
        "and scanned — partition pruning at the source, the 100 TB " +
        "layout for lang-sliced corpora (PartitionPruneSpec asserts " +
        "the selectedPartitions count for this layout)",
      Some(
        """SELECT source, count(*) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
          |FROM documents WHERE lang = 'en'
          |GROUP BY source ORDER BY source""".stripMargin),
    ) { (s, dir) =>
      val out = s"${Scratch.dir()}/bylang"
      Tables.documents(s, dir).write.partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .filter(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("source")
    },

    Q(
      "q_schema_merge",
      "parquet schema evolution at the source: an old batch written " +
        "without the lang column and a new batch with it are read " +
        "together under mergeSchema=true — missing columns surface as " +
        "nulls, handled explicitly with coalesce. The lakehouse " +
        "reality at 100 TB: batches from different pipeline versions " +
        "coexist and the reader, not a rewrite job, absorbs the drift",
      Some(
        """SELECT CASE WHEN doc_id < 250 THEN 'unknown' ELSE lang END AS lang,
          |  count(*) AS n_docs
          |FROM documents WHERE doc_id < 500
          |GROUP BY 1 ORDER BY 1""".stripMargin),
    ) { (s, dir) =>
      val base = s"${Scratch.dir()}/evolving"
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 500)
      docs.filter(col("doc_id") < 250)
        .select("doc_id", "text").write.parquet(s"$base/v1")
      docs.filter(col("doc_id") >= 250)
        .select("doc_id", "text", "lang").write.parquet(s"$base/v2")
      s.read.option("mergeSchema", "true").parquet(s"$base/v1", s"$base/v2")
        .groupBy(coalesce(col("lang"), lit("unknown")).as("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")
    },

    Q(
      "q_jsonl_source",
      "JSON-lines source/sink roundtrip: documents written as JSONL, " +
        "re-read with an explicit schema (schema-on-read — no " +
        "inference scan at scale), aggregated per source; the oracle " +
        "runs on the original parquet, so any roundtrip corruption " +
        "(escaping, nulls, numeric width) breaks the hash. JSONL " +
        "splits by newline, so reads parallelize like text at 100 TB",
      Some(
        """SELECT source, count(*) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
          |FROM documents GROUP BY source ORDER BY source""".stripMargin),
    ) { (s, dir) =>
      val jsonDir = s"${Scratch.dir()}/jsonl"
      Tables.documents(s, dir).write.json(jsonDir)
      s.read
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .json(jsonDir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .orderBy("source")
    },

    Q(
      "q_json_multiline",
      "multiLine JSON source: the corpus serialized as ONE JSON ARRAY " +
        "document (the shape REST APIs and exports actually produce, " +
        "vs JSONL's line-per-record), read back with multiLine=true " +
        "and an explicit schema — same lossless-roundtrip oracle as " +
        "q_jsonl_source. The 100 TB note is the SPLITTABILITY TRAP " +
        "(the q_gzip_source lesson in JSON form): a multiLine " +
        "document is one task — the parser must see the whole array " +
        "— so ingestion splits it into many bounded array files (one " +
        "per partition here) to restore file-granularity parallelism, " +
        "and the FIRST thing a pipeline does with API exports is " +
        "rewrite them to a splittable layout",
      Some(
        """SELECT source, count(*) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
          |FROM documents GROUP BY source ORDER BY source""".stripMargin),
    ) { (s, dir) =>
      val jsonDir = s"${Scratch.dir()}/mljson"
      // One bounded JSON ARRAY per partition: concat the rows' JSON
      // objects inside each partition (mapPartitions-free — a
      // partition-local agg on the partition id).
      Tables.documents(s, dir)
        .withColumn("pid", spark_partition_id())
        .select(col("pid"), to_json(struct(col("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars"))).as("j"))
        .groupBy("pid")
        .agg(concat_ws(",\n", collect_list(col("j"))).as("body"))
        .select(concat(lit("[\n"), col("body"), lit("\n]")).as("value"))
        .write.text(jsonDir)
      s.read
        .option("multiLine", "true")
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .json(jsonDir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .orderBy("source")
    },

    Q(
      "q_orc_source",
      "ORC source/sink roundtrip — the third columnar container after " +
        "parquet and the row formats: documents written as ORC, " +
        "re-read with an explicit schema and aggregated per source; " +
        "the oracle runs on the original parquet, so any " +
        "encoding/width drift in the roundtrip breaks the hash. ORC " +
        "stripes split like parquet row-groups, so reads parallelize " +
        "identically at 100 TB",
      Some(
        """SELECT source, count(*) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
          |FROM documents GROUP BY source ORDER BY source""".stripMargin),
    ) { (s, dir) =>
      val orcDir = s"${Scratch.dir()}/orc"
      Tables.documents(s, dir).write.orc(orcDir)
      s.read
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .orc(orcDir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .orderBy("source")
    },

    Q(
      "q_csv_source",
      "CSV source/sink roundtrip: documents written as headered CSV, " +
        "re-read with an explicit schema (schema-on-read — no " +
        "inference pass over 100 TB) and aggregated per lang; the " +
        "oracle runs on the original parquet, so any quoting/escaping " +
        "or numeric-width corruption in the roundtrip breaks the " +
        "hash. With multiLine off, CSV splits on newlines and reads " +
        "parallelize exactly like raw text",
      Some(
        """SELECT lang, count(*) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    ) { (s, dir) =>
      val csvDir = s"${Scratch.dir()}/csv"
      Tables.documents(s, dir).write.option("header", "true").csv(csvDir)
      s.read
        .option("header", "true")
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .csv(csvDir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .orderBy("lang")
    },

    Q(
      "q_gzip_source",
      "gzip-compressed text source/sink roundtrip: the wordcount " +
        "corpus written as .txt.gz part files (Hadoop codec inferred " +
        "from the extension on BOTH write and read — no format flag), " +
        "re-read and token-counted; the oracle runs on the original " +
        "parquet so any codec corruption breaks the hash. The 100 TB " +
        "note is the SPLITTABILITY trap: gzip streams cannot be " +
        "split, so one .gz file = one task regardless of " +
        "maxPartitionBytes — a single 100 GB .gz serializes the whole " +
        "scan. The sink side is the mitigation this query " +
        "demonstrates: many bounded part files (per-partition gzip " +
        "members), which restore scan parallelism at the file " +
        "granularity; bzip2/zstd-seekable or parquet remain the " +
        "splittable alternatives",
      Some(
        """SELECT w, count(*) AS n FROM (
          |  SELECT unnest(string_split(lower(replace(text, chr(10), ' ')), ' ')) AS w
          |  FROM documents)
          |WHERE w <> '' GROUP BY w ORDER BY w""".stripMargin),
    ) { (s, dir) =>
      val gzDir = s"${Scratch.dir()}/gz"
      // One record per LINE is the text sink's contract: embedded
      // newlines would split a doc into several records on re-read
      // and silently fork from the parquet-based oracle, so both
      // engines flatten them to spaces (a no-op on this corpus,
      // a guard under corpus regeneration).
      Tables.documents(s, dir)
        .select(regexp_replace(col("text"), "\n", " ").as("text"))
        .write.option("compression", "gzip").text(gzDir)
      s.read.text(s"$gzDir/*.txt.gz")
        .select(explode(split(lower(col("value")), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy("w")
    },
  )
}
