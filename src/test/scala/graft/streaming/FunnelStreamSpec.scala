package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.analytics.AdvancedQueries
import org.apache.spark.sql.functions._

/** The retained-candidate state makes the streamed funnel EXACT for
  * ANY slicing of arrivals: after every batch the summary equals the
  * batch operator over the union of everything delivered — including
  * the adversarial order that breaks a 4-slot state (a user's tail
  * events arriving before their signup: the candidate log holds them
  * below the undefined chain until the head arrives). Plus the
  * pruning law (events above the chain are discarded, so a
  * chain-ordered corpus keeps ≤ steps rows per user) and the family
  * contract: replay skip, stale/step-signature refusal, redelivery
  * immunity, null guard, engine leg.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  // 50 users. Event-time shape per user u: a view BEFORE the signup
  // (50+u — must never count), signup 100+u, views 200+u/300+u,
  // clicks 250+u (before the qualifying view for half the users it
  // still qualifies — strictly-after semantics decide) and 400+u,
  // purchase 500+u for u%3!=0; u%5==0 users never click (chain break:
  // their purchase must not count).
  private def corpus: Seq[(Long, String, Long)] =
    (0L until 50L).flatMap { u =>
      Seq((u, "view", 50 + u), (u, "signup", 100 + u),
        (u, "view", 200 + u), (u, "view", 300 + u),
        (u, "click", 250 + u), (u, "click", 400 + u)) ++
        (if (u % 3 == 0) Seq.empty else Seq((u, "purchase", 500 + u)))
    }.filterNot { case (u, t, _) => u % 5 == 0 && t == "click" }

  private def df(s: Seq[(Long, String, Long)]) =
    s.toDF("user_id", "event_type", "ts_us")

  private def summary(d: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    d.collect().map(_.toSeq).toSeq.sortBy(_.head.toString)

  private def oneShot(rows: Seq[(Long, String, Long)]): Seq[Seq[Any]] =
    summary(AdvancedQueries.funnelOver(spark, df(rows)))

  private def slicings: Seq[Seq[Seq[(Long, String, Long)]]] = {
    val c = corpus
    Seq(
      // round-robin thirds (every step type in every batch)
      (0 until 3).map(b => c.zipWithIndex.collect {
        case (e, i) if i % 3 == b => e }),
      // ADVERSARIAL: every tail event first, signups LAST — the
      // 4-slot counterexample (nothing qualifies until batch 2)
      Seq(c.filter(e => e._2 == "purchase" || e._2 == "click"),
        c.filter(_._2 == "view"),
        c.filter(_._2 == "signup")),
      // per-user split: half the users' whole history per batch, then
      // a batch that redelivers batch 0 verbatim (idempotence inline)
      Seq(c.filter(_._1 % 2 == 0), c.filter(_._1 % 2 == 1),
        c.filter(_._1 % 2 == 0)))
  }

  test("streamed summary == batch operator over the union after EVERY batch, for every slicing") {
    slicings.zipWithIndex.foreach { case (slices, si) =>
      val dir = Files.createTempDirectory(s"graft-funnel$si").toString
      val fn = FunnelStream.pipeline(dir)
      slices.zipWithIndex.foreach { case (s, i) =>
        fn(df(s), i.toLong)
        val seen = slices.take(i + 1).flatten
        assert(summary(FunnelStream.funnel(spark, dir)) == oneShot(seen),
          s"slicing $si, after batch $i")
      }
    }
  }

  test("property: seeded RANDOM slicings all converge to the batch operator") {
    val want = oneShot(corpus)
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val parts = corpus.groupBy(_ => rnd.nextInt(4))
      val slices = (0 until 4).map(b => parts.getOrElse(b, Seq.empty))
      val dir = Files.createTempDirectory(s"graft-funnelprop$seed").toString
      val fn = FunnelStream.pipeline(dir)
      slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
      assert(summary(FunnelStream.funnel(spark, dir)) == want, s"seed $seed")
    }
  }

  test("the 4-slot counterexample: tail events arriving before the head are HELD, then count") {
    val dir = Files.createTempDirectory("graft-funneladv").toString
    val fn = FunnelStream.pipeline(dir)
    val tails = corpus.filter(_._2 != "signup")
    fn(df(tails), 0L)
    // No signup yet: every chain is undefined, all four counts zero —
    // but the candidates are retained, not discarded.
    val s0 = summary(FunnelStream.funnel(spark, dir))
    assert(s0.forall(_(1) == 0L), s"no step should count yet: $s0")
    val held = FunnelStream.readMeta(spark, dir).get._1
    assert(held == tails.distinct.size.toLong,
      s"ALL orphaned tail events must be retained while every chain " +
        s"is undefined: held $held of ${tails.distinct.size}")
    // The heads arrive: the funnel must now equal the batch operator
    // over everything — a state that dropped the gated-out views
    // would report zero step-2 users forever.
    fn(df(corpus.filter(_._2 == "signup")), 1L)
    assert(summary(FunnelStream.funnel(spark, dir)) == oneShot(corpus))
    assert(summary(FunnelStream.funnel(spark, dir)).exists(
      r => r.head == "2_view" && r(1).asInstanceOf[Long] > 0L))
  }

  test("pruning law: a chain-ordered corpus retains <= one row per reached step per user") {
    val dir = Files.createTempDirectory("graft-funnelbound").toString
    val fn = FunnelStream.pipeline(dir)
    // Strictly chain-ordered event time (no tail event precedes its
    // head, every chain completes): after any batches, retained rows
    // == SUM over users of steps reached — the "users × 4 longs"
    // regime, exactly.
    val ordered: Seq[(Long, String, Long)] = (0L until 50L).flatMap { u =>
      Seq((u, "signup", 100 + u), (u, "view", 200 + u),
        (u, "view", 300 + u), (u, "click", 250 + u),
        (u, "click", 400 + u), (u, "purchase", 500 + u))
    }
    val slices = (0 until 3).map(b => ordered.zipWithIndex.collect {
      case (e, i) if i % 3 == b => e })
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val reached = oneShot(ordered).map(_(1).asInstanceOf[Long]).sum
    val retained = FunnelStream.readMeta(spark, dir).get._1
    assert(retained == reached,
      s"retained $retained rows, chain slots say $reached")
    // And the noise above the chain is genuinely gone: redeliver the
    // whole corpus; rows must not grow.
    fn(df(ordered), 3L)
    assert(FunnelStream.readMeta(spark, dir).get._1 == retained)
  }

  test("replay skips; stale and step-signature mismatch refuse; nulls dropped; fresh empty") {
    val dir = Files.createTempDirectory("graft-funnelre").toString
    assert(FunnelStream.events(spark, dir).count() == 0L)
    assert(summary(FunnelStream.funnel(spark, dir)).forall(_(1) == 0L))
    val fn = FunnelStream.pipeline(dir)
    val dirty = df(corpus).unionByName(
      Seq((Option.empty[Long], Option("signup"), Option(7L)),
          (Option(3L), Option("signup"), Option.empty[Long]),
          (Option(3L), Option.empty[String], Option(7L)))
        .toDF("user_id", "event_type", "ts_us"))
    fn(dirty, 0L)
    assert(summary(FunnelStream.funnel(spark, dir)) == oneShot(corpus))
    val metaBefore = FunnelStream.readMeta(spark, dir)
    fn(df(corpus), 0L) // replay: skip
    assert(FunnelStream.readMeta(spark, dir) == metaBefore)
    intercept[IllegalStateException] { fn(df(corpus), -1L) }
    intercept[IllegalStateException] {
      FunnelStream.pipeline(dir, Seq("signup", "view"))(df(corpus), 9L)
    }
    intercept[IllegalStateException] {
      FunnelStream.funnel(spark, dir, Seq("signup", "view"))
    }
    intercept[IllegalArgumentException] {
      FunnelStream.pipeline(dir, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      FunnelStream.pipeline(dir, Seq("a", "a"))
    }
  }

  test("under the streaming engine: MemoryStream batches converge to the one-shot summary") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-funneleng").toString
    val fn = FunnelStream.pipeline(dir)
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("user_id", "event_type", "ts_us")
      .writeStream.foreachBatch(fn).start()
    try {
      slicings.head.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(summary(FunnelStream.funnel(spark, dir)) == oneShot(corpus))
  }
}
