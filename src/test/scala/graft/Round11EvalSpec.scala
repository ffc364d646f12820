package graft

import graft.operators.EventsOps
import org.scalatest.funsuite.AnyFunSuite

/** Hand-exact pins for the round-11 model-eval additions: average
  * precision (perfect ranking = 1, an all-tied score = prevalence),
  * the Brier/Murphy decomposition (a two-bin design with hand-exact
  * reliability/resolution and the identity against the directly
  * computed score), and Cronbach's α (parallel items = 1, a
  * negatively-dependent battery goes negative).
  */
class Round11EvalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("pr auc: perfect, worst, and all-tied rankings are exact") {
    import spark.implicits._
    // (k, np_s, nn_s): one positive above one negative → AP = 1.
    val perfect = Seq((2L, 1L, 0L), (1L, 0L, 1L))
    val gp = EventsOps.prAucTail(perfect.toDF("k", "np_s", "nn_s"))
      .collect()(0)
    assert(gp.getDouble(2) == 1.0, s"AP ${gp.getDouble(2)}")
    // Positive ranked below the negative: the only positive block
    // sees precision 1/2 → AP = 0.5.
    val worst = Seq((2L, 0L, 1L), (1L, 1L, 0L))
    val gw = EventsOps.prAucTail(worst.toDF("k", "np_s", "nn_s"))
      .collect()(0)
    assert(gw.getDouble(2) == 0.5, s"AP ${gw.getDouble(2)}")
    // One tied block of 3 pos / 7 neg: AP = prevalence = 0.3.
    val tied = Seq((1L, 3L, 7L))
    val gt = EventsOps.prAucTail(tied.toDF("k", "np_s", "nn_s"))
      .collect()(0)
    assert(gt.getDouble(2) == 0.3 && gt.getDouble(3) == 0.3)
  }

  test("brier: two-bin design has exact terms and the Murphy identity") {
    import spark.implicits._
    // 10 users at score 0 (bin 0, forecast 0.05) with 1 churner; 10
    // at score 1e6 (bin 9, forecast 0.95) with 9. REL = 2·(0.05²·½)
    // = 0.0025, RES = 2·(0.4²·½) = 0.16, UNC = 0.25, and the
    // directly computed Brier is 0.0925 = REL − RES + UNC exactly.
    val rows = (Seq.fill(1)((1L, 0L)) ++ Seq.fill(9)((0L, 0L))) ++
      (Seq.fill(9)((1L, 1000000L)) ++ Seq.fill(1)((0L, 1000000L)))
    val got = EventsOps.brierDecomp(rows.toDF("churned", "si")).collect()(0)
    assert(got.getLong(0) == 20 && got.getLong(1) == 2)
    assert(got.getDouble(2) == 0.0925, s"brier ${got.getDouble(2)}")
    assert(got.getDouble(3) == 0.0025, s"rel ${got.getDouble(3)}")
    assert(got.getDouble(4) == 0.16, s"res ${got.getDouble(4)}")
    assert(got.getDouble(5) == 0.25, s"unc ${got.getDouble(5)}")
  }

  test("cronbach: parallel items read alpha = 1; one-hot goes negative") {
    import spark.implicits._
    // User u emits u events of BOTH types: the two item scores are
    // identical → ΣVar_item/Var_total = 1/2 → α = 2·(1 − 1/2) = 1.
    val par = (1L to 4L).flatMap(u =>
      (1L to u).flatMap(_ => Seq((u, "a"), (u, "b"))))
    val gp = EventsOps.cronbachAlpha(par.toDF("user_id", "event_type"))
      .collect()(0)
    assert(gp.getLong(0) == 4 && gp.getLong(1) == 2)
    assert(gp.getDouble(2) == 1.0, s"alpha ${gp.getDouble(2)}")
    // {a}, {b}, {a,b}: num = 4, den = 2 → share 2 → α = −2.
    val onehot = Seq((1L, "a"), (2L, "b"), (3L, "a"), (3L, "b"))
    val go = EventsOps.cronbachAlpha(onehot.toDF("user_id", "event_type"))
      .collect()(0)
    assert(go.getDouble(2) == -2.0, s"alpha ${go.getDouble(2)}")
    assert(go.getDouble(3) == 2.0, s"share ${go.getDouble(3)}")
  }
}
