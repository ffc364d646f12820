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
        .pipe(Seq("sh", "-c", "tr ' ' '\\n' | tr '[:upper:]' '[:lower:]'"))
      s.createDataset(mapped)
        .toDF("word")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy("word")
    },
  )
}
