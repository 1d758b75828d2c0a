package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registered query at the given SF
  * and prints one JSON line. Failures are reported per query (never folded
  * into a fake fast timing). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: open every table once so the first timed query does
    // not absorb file-listing/footer-read/codegen costs that belong to none
    // of them
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try graft.queries.Tables.t(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // materialize path-based fixtures (s5/k2b/st3) untimed, so the fixture
    // build cost lands in none of the timed queries
    try graft.queries.Fixtures.ensureAll(spark, sfDir)
    catch { case _: Throwable => () }
    // Optional subset for targeted local adjudication runs (comma-separated
    // query names); the per-round driver run never sets this, so the
    // committed artifact always covers the full registry.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // Audit-tier queries (full-corpus S-curve / copy-detection audits) are
    // correctness-graded by Verify but skipped in the timed per-round bench
    // — each has a registered sampled twin (dd17b/dd10b) carrying the bench
    // datapoint, per BENCH.md "audit tier". SPARK_GRAFT_BENCH_AUDIT=1 times
    // them too for ad-hoc audit-cost tracking.
    val auditTier: Set[String] =
      if (sys.env.get("SPARK_GRAFT_BENCH_AUDIT").contains("1")) Set.empty
      else Set("dd17_lsh_scurve", "dd10_fingerprint_matches")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .filter { case (n, _) => only.isDefined || !auditTier.contains(n) }
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // steady-state warmup: one untimed pass of every query AT THE
    // BENCHMARKED SF. This fills the codegen cache and — critically —
    // drives the per-document parse/hash methods past the C2 invocation
    // threshold (~15k calls), which a smaller-SF warmup never reaches; the
    // first timed run would otherwise absorb tier-up compilation mid-query.
    // Same amortization a long-lived cluster gets for free; every timed
    // number below still includes all data-proportional work at this SF.
    selected.foreach { case (_, fn) =>
      spark.sharedState.cacheManager.clearCache()
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // min of N timed runs (default 3), INTERLEAVED round-robin across the
    // whole registry: pass 1 times every query, then pass 2, then pass 3.
    // On a shared VM a noisy window (neighbor steal, GC storm, page-cache
    // churn) spans minutes — back-to-back per-query repeats all land inside
    // it and the "min" inherits the noise for exactly the queries that ran
    // then, which is what made round 8's driver artifact uniformly inflated
    // and query-correlated. Interleaving decorrelates session heat from
    // query identity: a noisy window taxes one PASS, and every query keeps
    // two samples from outside it. Each timed run still starts cold on the
    // cache manager — queries that cache intermediates must not leave
    // storage pinned for their successors.
    (1 to runs).foreach { pass =>
      selected.foreach { case (name, fn) =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          timings(name) = math.min(timings.getOrElse(name, Double.MaxValue), dt)
          errors.remove(name)
        } catch {
          case e: Throwable => if (!timings.contains(name))
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\\\\\"\\n\\r\\t]", " ").take(160)
        }
      }
      System.err.println(s"bench pass $pass/$runs done")
    }
    val qs = timings.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}"""
    println(line)
    val artifact = persist(line)
    // Short summary line LAST: the driver records the TAIL of stdout
    // (~2 KB), which the ~4 KB per-query line above always overruns —
    // r9's before-the-long-line placement left the tail starting mid-way
    // through the long line and "parsed" null. Printed last, this line is
    // whole inside any tail window. Named "total_summary" (not "total") so
    // no consumer — first-match, last-match, or tail — can bind it as the
    // complete record; it also names the committed artifact carrying the
    // full per-query map.
    println(s"""{"metric":"total_summary","value":$total,"unit":"sec","n":${timings.size},"runs":$runs,"sf":"$sfDir","artifact":"$artifact"}""")
    spark.stop()
  }

  /** Write the complete timing map to `bench/bench_r{N}.json` in-repo. The
    * driver's BENCH tail truncates the stdout line at ~2 KB, which hides half
    * the registry; the committed artifact is the durable record (BENCH.md).
    * N = max round seen in existing BENCH_r\*.json artifacts + 1, overridable
    * via SPARK_GRAFT_BENCH_OUT (full path) for ad-hoc local runs. Returns the
    * written path (or "unpersisted" on failure) for the stdout summary. */
  private def persist(line: String): String = {
    import java.nio.file.{Files, Paths}
    try {
      val repo = Paths.get(sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"))
      val out = sys.env.get("SPARK_GRAFT_BENCH_OUT").map(Paths.get(_)).getOrElse {
        val rounds = Option(repo.toFile.list()).getOrElse(Array.empty[String])
          .flatMap { n => "^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(n).map(_.group(1).toInt) }
        val n = if (rounds.isEmpty) 0 else rounds.max + 1
        // a BENCH_ONLY-filtered run is a sanity probe, not the round
        // artifact — writing it to bench_r{N}.json would clobber the
        // full-coverage record the anchor protocol diffs against (it
        // did, twice); probes land in a side file instead
        if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY"))
          repo.resolve(f"bench/bench_r$n%02d_probe.json")
        else repo.resolve(f"bench/bench_r$n%02d.json")
      }
      Files.createDirectories(out.getParent)
      Files.write(out, (line + "\n").getBytes("UTF-8"))
      System.err.println(s"bench artifact written: $out")
      out.toString
    } catch {
      case e: Throwable =>
        System.err.println(s"bench persist failed: $e"); "unpersisted"
    }
  }
}
