package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{TextFunctions => TF}

/** Property tests (SURVEY.md §5.2): scalacheck generators drive one
  * batched Spark evaluation per property (a per-sample Spark job would
  * be orders slower for no extra coverage).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val tokenGen: Gen[String] = Gen.chooseNum(0, 40).map(i => s"w$i")
  private val docGen: Gen[String] =
    Gen.nonEmptyListOf(tokenGen).map(_.mkString(" "))

  private def sampleDocs(n: Int): Seq[String] =
    (0 until n).map(i => docGen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("property: jaccard(x,x)=1, symmetric, bounded in [0,1]") {
    val docs = sampleDocs(60)
    val pairs = docs.zip(docs.reverse).zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }.toDF("i", "a", "b")
    val checked = pairs.select(
      TF.jaccard(array_distinct(TF.tokens(col("a"))), array_distinct(TF.tokens(col("a")))).as("self"),
      TF.jaccard(array_distinct(TF.tokens(col("a"))), array_distinct(TF.tokens(col("b")))).as("ab"),
      TF.jaccard(array_distinct(TF.tokens(col("b"))), array_distinct(TF.tokens(col("a")))).as("ba"))
      .collect()
    checked.foreach { r =>
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == r.getDouble(2))
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
  }

  test("property: rollingFingerprint deterministic, in [0, P), content-sensitive") {
    val docs = sampleDocs(60).distinct
    val df = docs.toDF("text")
      .select(col("text"), TF.rollingFingerprint(col("text")).as("fp"))
    val a = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "two evaluations agree")
    assert(a.values.forall(v => v >= 0 && v < TF.MinhashPrime))
    // distinct docs rarely collide (not a strict property, but 60 docs
    // in a 2^31 space colliding would signal a broken fold)
    assert(a.values.toSeq.distinct.size >= docs.size - 1)
  }

  test("property: dedup idempotence and partial/final aggregation law") {
    val xs = (0 until 500).map(i =>
      (Gen.chooseNum(0L, 20L).pureApply(Gen.Parameters.default, Seed(i.toLong)), i.toLong))
    val df = xs.toDF("k", "v")
    val once = df.dropDuplicates("k")
    assert(once.count() == once.dropDuplicates("k").count())

    // sum over the union == sum of per-half sums (exact integer law —
    // the partial/final split Spark applies map-side must preserve it)
    val (h1, h2) = xs.splitAt(250)
    val total = df.agg(sum("v")).head().getLong(0)
    val s1 = h1.toDF("k", "v").agg(sum("v")).head().getLong(0)
    val s2 = h2.toDF("k", "v").agg(sum("v")).head().getLong(0)
    assert(total == s1 + s2)
  }

  test("property: minhash signature has numPerms components in [0, P); equal docs ⇒ equal sigs") {
    val docs = sampleDocs(30)
    val df = (docs ++ docs.take(5)).toDF("text")
    val sigs = df
      .select(col("text"), TF.shingleHashes(TF.shingles(col("text"), 3)).as("h"))
      .select(col("text"), TF.minhashSignatureFromHashes(col("h"), 32).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1))
    sigs.foreach { case (_, sig) =>
      assert(sig.length == 32)
      assert(sig.forall(v => v >= 0 && v < TF.MinhashPrime))
    }
    val byText = sigs.groupBy(_._1)
    byText.values.foreach(group =>
      assert(group.map(_._2).distinct.size == 1, "same text ⇒ same signature"))
  }

  test("property: SimHash chunk blocking is pigeonhole-COMPLETE on random corpora") {
    // The hard guarantee the operator's correctness rests on: ANY pair
    // within Hamming distance maxHamming MUST appear in the candidate
    // set (chunking only ever adds false positives, never drops true
    // ones). Checked by differencing the relational candidates against
    // brute-force pairs over the very signatures the operator builds.
    import graft.operators.Dedup
    val docs = (sampleDocs(80) ++ sampleDocs(80).take(10).map(_ + " w0"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (maxHamming <- Seq(2, 3, 6)) {
      val cands = Dedup.simhashCandidates(docs, maxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sigs = docs.select(col("doc_id"),
          Dedup.simhash64(col("text")).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val truePairs = for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        if java.lang.Long.bitCount(sa ^ sb) <= maxHamming
      } yield (a, b)
      val missed = truePairs.toSet -- cands
      assert(missed.isEmpty,
        s"maxHamming=$maxHamming: pigeonhole-complete candidates missed $missed")
    }
  }

  test("property: spherical Lloyd iterations never lower the k-means objective") {
    // The trainer's convergence property: the mean assignment cosine
    // (the spherical k-means objective) is non-decreasing in the
    // iteration count, up to the 6dp rounding the oracle needs.
    import graft.operators.Similarity
    import graft.functions.{VectorFunctions => VF}
    val embs = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    def objective(iters: Int): Double = {
      val c = broadcast(Similarity.trainCentroids(embs, 16, iters)
        .select(col("cid"), col("ce"), VF.l2Norm(col("ce")).as("cn")))
      embs.select(col("vec_id"), col("embedding"), VF.l2Norm(col("embedding")).as("nrm"))
        .where(col("nrm") > 0)
        .crossJoin(c)
        .withColumn("ccos",
          round(VF.dot(col("embedding"), col("ce")) / (col("nrm") * col("cn")), 6))
        .groupBy("vec_id").agg(max("ccos").as("best"))
        .agg(avg("best")).head().getDouble(0)
    }
    val objs = Seq(0, 1, 2).map(objective)
    info(s"objective by iteration: ${objs.map(o => f"$o%.4f").mkString(" -> ")}")
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-4, s"objective regressed: $a -> $b")
    }
  }

  test("property: triangleCounts ≡ brute-force triple enumeration on random graphs") {
    // Random canonical edge sets vs the O(n³) reference; one Spark job
    // per graph (5 graphs), Erdős–Rényi-ish with enough density to
    // actually close triangles.
    val rnd = new scala.util.Random(42)
    for (g <- 1 to 5) {
      val n = 8 + g * 2
      val edges = (for { a <- 0 until n; b <- a + 1 until n
        if rnd.nextDouble() < 0.35 } yield (a.toLong, b.toLong))
      val has = edges.toSet
      val expected = (for {
        a <- 0L until n.toLong; b <- a + 1 until n.toLong; c <- b + 1 until n.toLong
        if has((a, b)) && has((b, c)) && has((a, c))
      } yield Seq(a, b, c)).flatten
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = graft.operators.Graph.triangleCounts(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"graph $g (n=$n, |E|=${edges.size}): $got vs $expected")
    }
  }

  test("property: native StringShingles ≡ HOF reference on random texts, n in 1..5") {
    // Random docs plus adversarial whitespace shapes the token generator
    // can't produce (empty, leading/trailing/double spaces, multibyte).
    val docs = sampleDocs(40) ++ Seq("", " ", "  ", "a ", " a", "a  b",
      "ü ö ß", "東京 データ 解析")
    for (n <- 1 to 5) {
      val rows = docs.toDF("text")
        .select(TF.shingles(col("text"), n).as("native"),
          TF.shinglesHof(col("text"), n).as("hof"))
        .collect()
      rows.zip(docs).foreach { case (r, t) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n text='$t'")
      }
    }
  }

  test("property: Count-Min never undercounts and merges by addition on random streams") {
    import graft.operators.CountMin
    val (d, w) = (3, 16)
    for (g <- 0 until 4) {
      val stream = (0 until 400).map(i => tokenGen.pureApply(
        Gen.Parameters.default, Seed(g * 10000L + i)))
      val sk = CountMin.sketch(stream.toDF("item"), d, w)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val est = CountMin.estimates(stream.distinct.toDF("item"), sk, d, w)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (tok, n) =>
        assert(est(tok) >= n, s"gen $g: undercount on $tok")
      }
      // Total conservation per hash row.
      val rowSums = sk.groupBy("hrow").agg(sum("c")).collect()
        .map(_.getLong(1)).toSeq
      assert(rowSums == Seq.fill(d)(stream.size.toLong))
    }
  }

  test("property: Bloom has no false negatives and decisions are two-run deterministic") {
    import graft.operators.Bloom
    for (g <- 0 until 4) {
      val members = (0 until 30).map(i => tokenGen.pureApply(
        Gen.Parameters.default, Seed(g * 777L + i))).distinct
      val probes = (members ++ (0 until 50).map(i => s"absent${g}_$i")).distinct
      val bloom = Bloom.build(members.toDF("item"), 3, 64)
      def kept = Bloom.filterMembers(probes.toDF("item"), "item", bloom, 3, 64)
        .collect().map(_.getString(0)).toSet
      val k1 = kept
      members.foreach(x => assert(k1.contains(x), s"gen $g: false negative $x"))
      assert(kept == k1, "two evaluations agree")
    }
  }

  test("property: bottom-k merge law and weighted-key reference on random splits") {
    import graft.operators.Sampling
    for (g <- 0 until 4) {
      val ids = (0 until 200).map(i => Gen.chooseNum(0L, 100000L)
        .pureApply(Gen.Parameters.default, Seed(g * 31L + i))).distinct
      def ref(s: Seq[Long], k: Int) =
        s.sortBy(i => (TF.hexHash60Local(s"smp:$i"), i)).take(k)
      val df = ids.map(i => (i, s"d$i")).toDF("doc_id", "text")
      val got = Sampling.bottomK(df, "doc_id", 25).orderBy("smp_rn")
        .collect().map(_.getLong(0)).toSeq
      assert(got == ref(ids, 25), s"gen $g")
      // Merge law over a random split point.
      val cut = (g * 37 + 13) % ids.size
      val (a, b) = ids.splitAt(cut max 1)
      val merged = (ref(a, 25) ++ ref(b, 25))
        .sortBy(i => (TF.hexHash60Local(s"smp:$i"), i)).take(25)
      assert(merged == ref(ids, 25), s"gen $g merge law")
    }
  }
}
