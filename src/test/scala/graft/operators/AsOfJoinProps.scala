package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark

/** ScalaCheck law for the as-of join: the union+window plan must agree,
  * row for row, with the obvious per-probe definition — "the fact with the
  * maximum fact time <= (or < when strict) the probe time, within the key" —
  * computed the naive way. Random keys/times force tie, no-match, and
  * multi-fact-per-instant shapes. */
object AsOfJoinProps extends Properties("AsOfJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  case class Probe(k: String, pid: Long, pt: Timestamp)
  case class Fact(k: String, ft: Timestamp, payload: Long)

  private val genKey = Gen.oneOf("a", "b", "c")
  // coarse instant grid so equal-timestamp collisions actually happen
  private val genTime = Gen.choose(0, 20).map(h =>
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .plusHours(h.toLong)))

  private var nextPid = 0L
  private val genProbe = for { k <- genKey; t <- genTime } yield {
    nextPid += 1; Probe(k, nextPid, t)
  }
  // payload = a deterministic function of (key, time) so facts that share an
  // instant within a key are identical — the winner is then unambiguous and
  // the law needs no tie-break assumption on fact identity
  private val genFact = for { k <- genKey; t <- genTime }
    yield Fact(k, t, t.getTime / 1000 + k.hashCode)

  private def naive(probes: Seq[Probe], facts: Seq[Fact],
                    strict: Boolean): Set[(Long, Timestamp, Long)] =
    probes.flatMap { p =>
      val eligible = facts.filter(f => f.k == p.k &&
        (if (strict) f.ft.before(p.pt)
         else !f.ft.after(p.pt)))
      if (eligible.isEmpty) None
      else {
        val best = eligible.maxBy(_.ft.getTime)
        Some((p.pid, best.ft, best.payload))
      }
    }.toSet

  private def run(probes: Seq[Probe], facts: Seq[Fact],
                  strict: Boolean): Set[(Long, Timestamp, Long)] =
    AsOfJoin.asOf(probes.toDF(), facts.toDF(), Seq("k"), "pt", "ft",
      Seq("payload"), strict = strict)
      .collect()
      .map(r => (r.getLong(1), r.getTimestamp(3), r.getLong(4)))
      .toSet

  private val genProbes = Gen.listOfN(10, genProbe)
  private val genFacts = Gen.listOfN(10, genFact)

  property("asOf == naive max-at-or-before per probe") =
    forAll(genProbes, genFacts) { (probes, facts) =>
      run(probes, facts, strict = false) ===
        naive(probes, facts, strict = false)
    }

  property("strict asOf == naive max-strictly-before per probe") =
    forAll(genProbes, genFacts) { (probes, facts) =>
      run(probes, facts, strict = true) ===
        naive(probes, facts, strict = true)
    }

  implicit private class SetOps(a: Set[(Long, Timestamp, Long)]) {
    def ===(b: Set[(Long, Timestamp, Long)]): Boolean = a == b
  }
}
