package graft

import graft.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{GenerateMutableProjection, GenerateUnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Loud-failure regression gate for the codegen of ALL ten custom
  * Catalyst expressions (cent_argmin_l2, cent_argmin_cos, cosine_sim,
  * minhash60, simhash60, hypersig, bloom_might_contain, rollhash60,
  * jaro_winkler, nfc_normalize).
  *
  * Why this exists: broken `doGenCode` output does NOT fail the
  * build — Spark catches the Janino CompileException, logs one WARN,
  * and silently falls back to interpreted projection, voiding the
  * whole point of a fused expression while every correctness test
  * stays green. Two real instances motivated this suite:
  *   - CentArgmin/CosineSim derived a boxed temp's name from
  *     `ev.value`, which is not guaranteed to be a plain identifier
  *     in every codegen context (fixed via `ctx.freshName`);
  *   - Spark's own `BloomFilterMightContain` emits
  *     `mightContainLong((Long)<probe>)`, and when the probe constant
  *     folds to a NEGATIVE long literal Janino parses `(Long)-68…L`
  *     as "(expression Long) minus literal" and dies with
  *     `Expression "java.lang.Long" is not an rvalue` — seen live in
  *     ExtensionsSpec's `xxhash64(42L)` probe, which is why the
  *     engine registers graft's BloomMightContain instead.
  *
  * Two layers, both of which turn silent fallback into a test
  * failure:
  *  1. direct `GenerateUnsafeProjection.generate` /
  *     `GenerateMutableProjection.generate` over each expression —
  *     these throw on codegen compile errors (no fallback on this
  *     path) and the generated result is compared against the
  *     interpreted `eval`, pinning compilability AND codegen/interp
  *     agreement;
  *  2. SQL passes over every function with
  *     `spark.sql.codegen.factoryMode=CODEGEN_ONLY` and
  *     `spark.sql.codegen.fallback=false`, so a break anywhere in the
  *     planner-driven projection or whole-stage path also fails
  *     loudly instead of warning into the void.
  */
class CodegenOnlySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val vecType = ArrayType(FloatType, containsNull = false)
  private val toksType = ArrayType(StringType, containsNull = false)
  private val centType = StructType(Seq(
    StructField("cent_id", LongType, nullable = false),
    StructField("ce", vecType, nullable = false),
    StructField("cn2", DoubleType, nullable = false),
    StructField("cn", DoubleType, nullable = false)))
  private val csType = ArrayType(centType, containsNull = false)

  private def fvec(xs: Float*): GenericArrayData =
    new GenericArrayData(xs.toArray[Any])
  private def svec(xs: String*): GenericArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def cent(id: Long, ce: Seq[Float]): GenericInternalRow = {
    val n2 = ce.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
    new GenericInternalRow(Array[Any](id, fvec(ce: _*), n2, math.sqrt(n2)))
  }

  /** A small serialized bloom sketch holding exactly {42}. */
  private lazy val bloomBytes: Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100)
    bf.putLong(42L)
    val baos = new java.io.ByteArrayOutputStream()
    bf.writeTo(baos)
    baos.toByteArray
  }

  private val dim = HyperSig.Dim
  private val emb: Seq[Float] = (0 until dim).map(i => (i % 7 - 3) * 0.25f)
  private val emb2: Seq[Float] = (0 until dim).map(i => (i % 5 - 2) * 0.5f)

  /** (name, expression over BoundReferences/Literals, input row). */
  private def cases: Seq[(String, Expression, InternalRow)] = {
    val vecRef = BoundReference(0, vecType, nullable = true)
    val vec2Ref = BoundReference(1, vecType, nullable = true)
    val csRef = BoundReference(1, csType, nullable = true)
    val toksRef = BoundReference(0, toksType, nullable = true)
    val embRow = new GenericInternalRow(Array[Any](
      fvec(emb: _*),
      new GenericArrayData(Array[Any](cent(4L, emb2), cent(2L, emb.map(_ + 1.0f))))))
    val pairRow = new GenericInternalRow(Array[Any](fvec(emb: _*), fvec(emb2: _*)))
    val tokRow = new GenericInternalRow(Array[Any](svec("the", "quick", "brown", "fox")))
    val bloomLit = Literal(bloomBytes, BinaryType)
    Seq(
      ("cent_argmin_l2", CentArgmin(vecRef, csRef, cosine = false), embRow),
      ("cent_argmin_cos", CentArgmin(vecRef, csRef, cosine = true), embRow),
      ("cosine_sim", CosineSim(vecRef, vec2Ref), pairRow),
      ("minhash60", MinHashSignature(toksRef), tokRow),
      ("simhash60", SimHashSignature(toksRef), tokRow),
      ("hypersig", HyperplaneSignature(vecRef),
        new GenericInternalRow(Array[Any](fvec(emb: _*)))),
      ("rollhash60",
        RollingGramHashes(BoundReference(0, StringType, nullable = true),
          Literal(3)),
        new GenericInternalRow(Array[Any](UTF8String.fromString("abcdef")))),
      ("jaro_winkler",
        JaroWinklerSim(BoundReference(0, StringType, nullable = true),
          Literal(UTF8String.fromString("marhta"), StringType)),
        new GenericInternalRow(Array[Any](UTF8String.fromString("martha")))),
      ("nfc_normalize",
        NfcNormalize(BoundReference(0, StringType, nullable = true)),
        new GenericInternalRow(Array[Any](UTF8String.fromString("caf\u00e9 e\u0301")))),
      ("bloom_might_contain(col)",
        BloomMightContain(bloomLit, BoundReference(0, LongType, nullable = false)),
        new GenericInternalRow(Array[Any](42L))),
      // The Janino trap shape: a folded NEGATIVE literal probe. With
      // Spark's built-in probe this projection does not compile.
      ("bloom_might_contain(-literal)",
        BloomMightContain(bloomLit, Literal(-6876166290308861218L)),
        new GenericInternalRow(0)),
      ("sorted_intersect_count",
        SortedIntersectCount(
          BoundReference(0, toksType, nullable = false),
          BoundReference(1, toksType, nullable = false)),
        new GenericInternalRow(Array[Any](
          svec("a", "b", "d"), svec("b", "c", "d")))),
      ("sorted_intersect_first",
        SortedIntersectFirst(
          BoundReference(0, toksType, nullable = false),
          BoundReference(1, toksType, nullable = false)),
        new GenericInternalRow(Array[Any](
          svec("a", "b", "d"), svec("b", "c", "d")))),
      ("sorted_suffix_hamming_lb",
        SortedSuffixHammingLB(
          BoundReference(0, toksType, nullable = false),
          BoundReference(1, toksType, nullable = false),
          Literal(1), Literal(0)),
        new GenericInternalRow(Array[Any](
          svec("a", "b", "d"), svec("b", "c", "d")))))
  }

  /** Normalizes a result (boxed scalar or ArrayData) for comparison. */
  private def norm(v: Any): Any = v match {
    case a: ArrayData => a.toLongArray.toSeq
    case x => x
  }

  private def projected(row: InternalRow, dt: DataType): Any = dt match {
    case IntegerType => if (row.isNullAt(0)) null else row.getInt(0)
    case LongType => if (row.isNullAt(0)) null else row.getLong(0)
    case DoubleType => if (row.isNullAt(0)) null else row.getDouble(0)
    case BooleanType => if (row.isNullAt(0)) null else row.getBoolean(0)
    case ArrayType(LongType, _) =>
      if (row.isNullAt(0)) null else row.getArray(0).toLongArray.toSeq
    case StringType =>
      if (row.isNullAt(0)) null else row.getUTF8String(0).clone()
    case other => fail(s"unhandled result type $other")
  }

  private def withStrictCodegen[A](body: => A): A = {
    val savedMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val savedFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body finally {
      savedMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      savedFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("GenerateUnsafeProjection compiles and agrees with eval for all eight expressions") {
    for ((name, e, row) <- cases) {
      val interp = norm(e.eval(row))
      assert(interp != null, s"$name: test input unexpectedly evaluated to null")
      // generate() throws CompileException on broken codegen — there is
      // no interpreted fallback on this path, which is the point.
      val proj = GenerateUnsafeProjection.generate(Seq(e))
      assert(projected(proj(row), e.dataType) === interp,
        s"$name: unsafe-projection codegen disagrees with interpreted eval")
    }
  }

  test("GenerateMutableProjection compiles and agrees with eval for all eight expressions") {
    for ((name, e, row) <- cases) {
      val interp = norm(e.eval(row))
      val proj = GenerateMutableProjection.generate(Seq(e))
      proj.target(new GenericInternalRow(1))
      assert(projected(proj(row), e.dataType) === interp,
        s"$name: mutable-projection codegen disagrees with interpreted eval")
    }
  }

  test("all-literal-argument SQL compiles under CODEGEN_ONLY") {
    // Fully-foldable arguments exercise constant folding plus the
    // projection paths over whatever survives folding — the class of
    // shape where both historical breaks hid.
    CentAssign.register(spark); CosSim.register(spark)
    MinHash60.register(spark); SimHash60.register(spark)
    HyperSig.register(spark); RollHash.register(spark)
    JaroWinkler.register(spark); UnicodeNorm.register(spark)
    val sql =
      """SELECT minhash60(array('a b c', 'b c d')) AS mh,
        |  simhash60(array('a', 'b')) AS sh,
        |  rollhash60('abcdef', 3) AS rh,
        |  jaro_winkler('martha', 'marhta') AS jw,
        |  length(nfc_normalize('e\u0301x')) AS nn,
        |  hypersig(CAST(array_repeat(0.5D, 64) AS ARRAY<FLOAT>)) AS hs,
        |  cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |             CAST(array(0.5, 0.5) AS ARRAY<FLOAT>)) AS cs,
        |  cent_argmin_l2(
        |    CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |    array(struct(7L AS cent_id, CAST(array(1.0, 0.0) AS ARRAY<FLOAT>) AS ce, 1.0D AS cn2, 1.0D AS cn),
        |          struct(9L AS cent_id, CAST(array(0.0, 1.0) AS ARRAY<FLOAT>) AS ce, 1.0D AS cn2, 1.0D AS cn))) AS cell,
        |  cent_argmin_cos(
        |    CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |    array(struct(7L AS cent_id, CAST(array(1.0, 0.0) AS ARRAY<FLOAT>) AS ce, 1.0D AS cn2, 1.0D AS cn),
        |          struct(9L AS cent_id, CAST(array(0.0, 1.0) AS ARRAY<FLOAT>) AS ce, 1.0D AS cn2, 1.0D AS cn))) AS cell_cos
        |""".stripMargin
    withStrictCodegen {
      val row = spark.sql(sql).collect().head
      assert(row.getLong(7) == 7L && row.getLong(8) == 7L)
      assert(row.getSeq[Long](2) ===
        Seq("abc", "bcd", "cde", "def").map(RollHash.gramHash))
      assert(row.getDouble(3) == 0.9611111111111111)
      assert(row.getInt(4) == 2, "nfc composes e+combining-acute")
    }
  }

  test("bloom probe with folded negative-literal hash compiles under CODEGEN_ONLY") {
    // xxhash64(42L) folds to a negative long literal — the exact shape
    // that made Spark's built-in BloomFilterMightContain emit
    // uncompilable Java and silently interpret the projection.
    Bloom.register(spark)
    spark.range(100).createOrReplaceTempView("bloom_cg_t")
    withStrictCodegen {
      val row = spark.sql(
        """SELECT bloom_might_contain(
          |    (SELECT bloom_agg(xxhash64(id)) FROM bloom_cg_t),
          |    xxhash64(42L)) AS hit,
          |  bloom_might_contain(
          |    (SELECT bloom_agg(xxhash64(id)) FROM bloom_cg_t),
          |    xxhash64(1000L)) AS miss""".stripMargin).collect().head
      assert(row.getBoolean(0) && !row.getBoolean(1))
    }
  }

  test("all ten functions run end-to-end under CODEGEN_ONLY with whole-stage fallback off") {
    import spark.implicits._
    CentAssign.register(spark); CosSim.register(spark)
    MinHash60.register(spark); SimHash60.register(spark)
    HyperSig.register(spark); Bloom.register(spark); RollHash.register(spark)
    JaroWinkler.register(spark); UnicodeNorm.register(spark)
    val bloomHex = bloomBytes.map("%02X".format(_)).mkString
    val df = Seq((emb.toArray, emb2.toArray, Seq("a", "b", "a c"), 42L, "rolling"))
      .toDF("e1", "e2", "toks", "k", "txt")
      .select(col("e1"), col("e2"), col("toks"), col("k"), col("txt"),
        array(struct(lit(4L).as("cent_id"), col("e2").as("ce"),
          aggregate(transform(col("e2"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (a, x) => a + x).as("cn2"),
          sqrt(aggregate(transform(col("e2"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (a, x) => a + x)).as("cn"))).as("cs"))
    val sel = df.select(
      expr("cent_argmin_l2(e1, cs)").as("a"),
      expr("cent_argmin_cos(e1, cs)").as("b"),
      expr("cosine_sim(e1, e2)").as("c"),
      expr("minhash60(toks)").as("d"),
      expr("simhash60(toks)").as("e"),
      expr("hypersig(e1)").as("f"),
      expr(s"bloom_might_contain(unhex('$bloomHex'), k)").as("g"),
      expr("rollhash60(txt, 4)").as("h"),
      expr("jaro_winkler(txt, 'rolled')").as("i"),
      expr("nfc_normalize(txt)").as("j"))
    val baseline = sel.collect()
    withStrictCodegen {
      val strict = sel.collect()
      assert(strict.toSeq === baseline.toSeq)
    }
  }
}
