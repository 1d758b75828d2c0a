package graft.operators

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark

/** ScalaCheck laws for the load layer (SURVEY §5.2): K1 idempotence and the
  * J1 fiscal-copy guard's accept/reject/NULL semantics
  * (`income-statement-transform-load.rkt:116-165`). */
object LoadOpsProps extends Properties("LoadOps") {

  // Spark-backed properties: keep the sample count modest.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  case class Fact(act_symbol: String, date: Date, period: String,
                  f1: java.lang.Double, f2: String)

  private val genSym = Gen.oneOf("AAPL", "MSFT", "NVDA", "AMZN")
  private val genDate = Gen.choose(0, 400).map(d =>
    Date.valueOf(java.time.LocalDate.of(2023, 1, 1).plusDays(d.toLong)))
  private val genFact = for {
    s <- genSym; d <- genDate
    f1 <- Gen.oneOf[java.lang.Double](1.0, 2.5, null)
    f2 <- Gen.oneOf("x", "y")
  } yield Fact(s, d, "Year", f1, f2)
  private val genBatch = Gen.listOfN(8, genFact)

  private def df(rows: Seq[Fact]): DataFrame = rows.toDF()

  private val pk = Seq("act_symbol", "date", "period")

  property("K1 dedupAppend is idempotent: load . load = load") =
    forAll(genBatch, genBatch) { (existing, incoming) =>
      val e = df(existing); val i = df(incoming)
      val once = LoadOps.dedupAppend(e, i, pk)
      val twice = LoadOps.dedupAppend(once, i, pk)
      once.count() == twice.count() &&
        twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty
    }

  property("K1 existing rows always win over incoming PK twins") =
    forAll(genBatch) { rows =>
      val e = df(rows)
      val mutated = df(rows.map(r => r.copy(f2 = r.f2 + "!")))
      val loaded = LoadOps.dedupAppend(e, mutated, pk)
      loaded.exceptAll(e).isEmpty && e.exceptAll(loaded).isEmpty
    }

  private def plusYear(f: Fact): Fact =
    f.copy(date = Date.valueOf(f.date.toLocalDate.plusYears(1)))

  property("J1 rejects an exactly-copied prior year") =
    forAll(genBatch) { rows =>
      // non-null facts only: a NULL conjunct must NOT fire the guard
      val base = rows.map(_.copy(f1 = 7.0))
        .distinctBy(r => (r.act_symbol, r.date))
      val existing = df(base)
      val copied = df(base.map(plusYear))
      LoadOps.priorPeriodGuard(existing, copied, Seq("f1", "f2"))
        .count() == 0
    }

  property("J1 accepts any one differing fact") =
    forAll(genBatch) { rows =>
      val base = rows.map(_.copy(f1 = 7.0))
        .distinctBy(r => (r.act_symbol, r.date))
      val existing = df(base)
      val changed = base.map(r => plusYear(r).copy(f1 = 8.0))
      LoadOps.priorPeriodGuard(existing, df(changed), Seq("f1", "f2"))
        .count() == changed.size
    }

  property("J1 NULL conjunct lets the insert through (reference bool_and)") =
    forAll(genBatch) { rows =>
      // prior row holds NULL f1 -> `f1 = prior.f1` is NULL -> bool_and not
      // TRUE -> insert proceeds even though f2 matches
      val existing = df(rows.map(_.copy(f1 = null)).distinctBy(r => (r.act_symbol, r.date)))
      val incoming = rows.map(_.copy(f1 = null))
        .distinctBy(r => (r.act_symbol, r.date)).map(plusYear)
      LoadOps.priorPeriodGuard(existing, df(incoming), Seq("f1", "f2"))
        .count() == incoming.size
    }

  property("J1 nullSafe facts compare NULL as equal (quarterly is-null)") =
    forAll(genBatch) { rows =>
      val existing = df(rows.map(_.copy(f1 = null)).distinctBy(r => (r.act_symbol, r.date)))
      val incoming = rows.map(_.copy(f1 = null))
        .distinctBy(r => (r.act_symbol, r.date)).map(plusYear)
      // with f1 null-safe and f2 equal, the guard DOES fire
      LoadOps.priorPeriodGuard(existing, df(incoming), Seq("f2"),
        nullSafeFacts = Seq("f1")).count() == 0
    }
}
