package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** A shared SparkSession serves many queries at once on a real cluster
  * (notebooks, schedulers, a BI layer). The engine's registered queries
  * must be safe to PLAN and EXECUTE concurrently on one session — no
  * shared mutable state in operators, no temp-view collisions, no
  * cross-query config bleed (the streaming harness restores its
  * shuffle-partition override in a finally). */
class ConcurrencySpec extends SparkTestBase {

  test("a mixed batch of registered queries is result-identical under concurrency") {
    // spans joins, aggs, windows, dedup, sampling, percentiles, url parse,
    // and the iterative CC loop (its per-round observe metrics are keyed
    // by (name, dataset id) in ObservationManager, so concurrent runs with
    // identical metric names must not cross-talk — pinned here)
    val names = Seq("q1_pricing", "join_inner", "win_rank", "dedup_exact",
      "sample_mixture", "agg_percentile_disc", "fn_url", "agg_multi_distinct",
      "dedup_semantic",
      // SQL-surface queries (scoped temp views) and round-8 additions
      "sub_scalar", "join_existence", "search_bm25", "dq_audit")
    def run(name: String): Map[String, String] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(_.toString).groupBy(identity).map { case (k, v) => k -> v.length.toString }
    val sequential = names.map(n => n -> run(n)).toMap
    val concurrent = Await.result(
      Future.sequence(names.map(n => Future(n -> run(n)))), 5.minutes).toMap
    names.foreach { n =>
      assert(concurrent(n) == sequential(n), s"$n diverged under concurrency")
    }
  }

  test("the SAME SQL-surface query run concurrently with itself stays correct") {
    // withViews serializes the register->analyze->drop window per view
    // name; without it one thread's drop races another's analysis
    val expected = SparkEntry.queries("sub_scalar")(spark, sf).count()
    val counts = Await.result(Future.sequence(
      (1 to 4).map(_ => Future(SparkEntry.queries("sub_scalar")(spark, sf).count()))),
      5.minutes)
    assert(counts.forall(_ == expected), counts.toString)
  }

  test("the streaming harness's config override never bleeds across threads") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val fs = (1 to 3).map { _ =>
      Future(SparkEntry.queries("stream_tumbling")(spark, sf).collect().length)
    } :+ Future {
      // a streaming replay (sets partitions=8 in a finally-restored scope)
      SparkEntry.queries("stream_dedup_live")(spark, sf).collect().length
    }
    val counts = Await.result(Future.sequence(fs), 5.minutes)
    assert(counts.forall(_ > 0))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }
}
