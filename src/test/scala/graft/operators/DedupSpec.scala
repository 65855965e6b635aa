package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // Planted corpus: 0/1 exact dups, 2 a near-dup of 0 (one token changed
  // out of 12), 3-5 unrelated.
  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private def docs = Seq(
    (0L, base),
    (1L, base),
    (2L, base.replace("mu", "nu")),
    (3L, "one two three four five six seven eight nine ten eleven twelve"),
    (4L, "red orange yellow green blue indigo violet white black brown pink gray"),
    (5L, "spark catalyst tungsten parquet shuffle broadcast partition executor driver stage task job"))
    .toDF("doc_id", "text")

  test("exactClusters finds only the exact duplicate pair") {
    val rows = Dedup.exactClusters(docs).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n_docs") == 2)
    assert(rows(0).getAs[Long]("min_doc") == 0L)
    assert(rows(0).getAs[Long]("max_doc") == 1L)
  }

  test("minhashNearDups finds exact and near duplicates, nothing else") {
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L))) // exact dup: jaccard 1.0
    assert(keys.contains((0L, 2L)) && keys.contains((1L, 2L))) // near dup
    assert(keys.size == 3, s"unexpected pairs: ${pairs.mkString(",")}")
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0)
  }

  test("minhashCandidates cover every truth pair the verify stage keeps (audit invariant)") {
    // The q_dd11 audit's recall numerator counts truth pairs the banding
    // surfaced; identical shingle sets hash to identical signatures, so
    // exact dups MUST collide in every band — candidate recall 1.0 on
    // them — and the verified pair set is a subset of the candidates by
    // construction.
    val truth = Dedup.jaccardPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashCandidates(docs, md5Parity = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty && truth.contains((0L, 1L)))
    assert(truth.subsetOf(cand), s"missed truth pairs: ${truth -- cand}")
    val verified = Dedup.minhashNearDups(docs, threshold = 0.5, md5Parity = true)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(cand))
  }

  test("store-cached audit artifacts ≡ direct pipelines, and reads come from the artifact store (round 20)") {
    // The round-20 truth/candidate/closure artifacts must be
    // row-identical to the direct operators they memoize, and a
    // repeat call must serve parquet from graft_artifacts instead of
    // rebuilding — the q_dd11/q_dd14 oracle-equivalence rests on this.
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    assert(rows(Dedup.cachedJaccardPairs(docs, 0.5)) ==
      rows(Dedup.jaccardPairs(docs, 0.5)))
    assert(rows(Dedup.cachedPrefixCandidates(docs)) ==
      rows(Dedup.prefixCandidates(docs)))
    assert(rows(Dedup.cachedPrefixTruth(docs)) ==
      rows(Dedup.prefixJaccardVerify(docs, Dedup.prefixCandidates(docs))
        .select("doc_a", "doc_b")))
    assert(rows(Dedup.cachedMinhashCandidates(docs, md5Parity = true)) ==
      rows(Dedup.minhashCandidates(docs, md5Parity = true)))
    val pairs = Dedup.nearDupPairsMemo(docs, threshold = 0.5, md5Parity = true)
    assert(rows(Dedup.cachedClusters(pairs)) == rows(Dedup.dupClusters(pairs)))
    // Second call = same DataFrame identity class: a parquet read off
    // the pid-scoped artifact store, no rebuilt pipeline.
    val again = Dedup.cachedJaccardPairs(docs, 0.5)
    val plan = again.queryExecution.executedPlan.toString
    assert(plan.contains("graft_artifacts"),
      "repeat call must read the artifact store: " + plan.take(400))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the all-pairs cross must not rebuild on a hit: " + plan.take(400))
  }

  test("simhashNearDups: exact dups at hamming 0; small-edit near dup found; unrelated absent") {
    // SimHash bit stability needs enough tokens for the per-bit majority
    // to have margin — use a 64-token doc with a single-token edit.
    val long0 = (1 to 64).map(i => s"tok$i").mkString(" ")
    val long1 = long0.replace("tok64", "tok65") // 1/64 edit
    val other = (100 to 163).map(i => s"w$i").mkString(" ")
    val d = Seq((0L, long0), (1L, long0), (2L, long1), (3L, other))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(d, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.get((0L, 1L)).contains(0L), s"exact dup at hamming 0: $m")
    assert(m.contains((0L, 2L)) && m.contains((1L, 2L)), s"near dup found: $m")
    assert(!m.keySet.exists { case (a, b) => a == 3L || b == 3L }, s"unrelated absent: $m")
  }

  test("nearDups facade: defaults to MinHash-LSH, blocked SimHash on request, unblocked SimHash refused") {
    // Default route ≡ minhashNearDups — same pairs, same jaccard column.
    val viaFacade = Dedup.nearDups(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = Dedup.minhashNearDups(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaFacade == direct, s"facade default must be MinHash-LSH: $viaFacade vs $direct")

    // Blocked SimHash route ≡ simhashNearDups with the same keys.
    val long0 = (1 to 64).map(i => s"tok$i").mkString(" ")
    val d = Seq((0L, long0, "en"), (1L, long0, "en"), (2L, long0, "es"))
      .toDF("doc_id", "text", "lang")
    val blocked = Dedup.nearDups(d, Dedup.SimHashBlocked(Seq("lang")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == Set((0L, 1L)), // the es copy is cross-block, excluded
      s"blocked route must respect the blocking key: $blocked")

    // The measured-quadratic unblocked form is an explicit opt-out, not
    // a facade path: constructing SimHashBlocked without keys refuses.
    val ex = intercept[IllegalArgumentException] { Dedup.SimHashBlocked(Nil) }
    assert(ex.getMessage.contains("explicit blocking keys"), ex.getMessage)
  }

  test("minhashNearDups finds exact duplicates SHORTER than the shingle size") {
    val shortDocs = Seq(
      (0L, "tiny doc"), (1L, "tiny doc"), // 2 tokens < shingleSize 3
      (2L, "other words"), (3L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(shortDocs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((0L, 1L)), s"short exact dups found: ${pairs.toSet}")
  }

  test("jaccardPairs threshold filters and is symmetric-free (a<b only)") {
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.toSet == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("simhash blockBy cuts candidate volume on a low-entropy corpus") {
    // Low-entropy corpus: a tiny shared vocabulary makes signatures
    // cluster, so unblocked chunk buckets collide across the whole
    // corpus — the superlinear knee VERDICT r2 flagged at sf0.1 (272k
    // candidates from 5k docs). Blocking by lang must (a) cut the
    // candidate count by roughly the cross-block share and (b) leave
    // the within-block results identical.
    val vocab = Array("select", "from", "where", "group", "order", "join")
    val docs = (0 until 120).map { id =>
      val words = (0 until 12).map(j => vocab((id / 40 + j) % vocab.length))
      (id.toLong, words.mkString(" "), if (id % 2 == 0) "es" else "zh")
    }.toDF("doc_id", "text", "lang")
    val unblocked = Dedup.simhashCandidates(docs, maxHamming = 3).count()
    val blocked = Dedup.simhashCandidates(docs, maxHamming = 3,
      blockBy = Seq("lang")).count()
    info(s"candidates: unblocked=$unblocked, blocked-by-lang=$blocked")
    assert(blocked * 2 <= unblocked + 1,
      s"lang blocking should drop ~half the candidates ($unblocked -> $blocked)")
    val blockedPairs = Dedup.simhashNearDups(docs, maxHamming = 3,
      blockBy = Seq("lang")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sameLangSubset = Dedup.simhashNearDups(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a % 2 == b % 2 }.toSet
    assert(blockedPairs == sameLangSubset,
      "blocked output must equal the unblocked output restricted to same-lang pairs")
  }

  test("embeddingNearDupsAnn: subset of brute-force pairs (precision 1.0), useful recall") {
    val embs = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    // Brute-force truth on the full corpus at the same threshold.
    val exact = Dedup.embeddingNearDups(embs, threshold = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Dedup.embeddingNearDupsAnn(embs, threshold = 0.25,
        nCentroids = 16, trainN = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.subsetOf(exact),
      s"every ANN pair is exact-cosine verified, so false positives are impossible: ${ann -- exact}")
    val recall = if (exact.isEmpty) 1.0 else (ann intersect exact).size.toDouble / exact.size
    info(f"cell-blocked near-dup: ${ann.size}/${exact.size} pairs, recall=$recall%.3f")
    assert(exact.nonEmpty && recall >= 0.2,
      f"within-cell recall $recall%.3f collapsed (cells no longer correlate with cosine)")
  }

  test("dupClusters resolves components: chains, stars, singletons-by-absence") {
    // Component 1: a 4-node chain 10-11-12-13 (pointer jumping must close
    // it, not just direct neighbors); component 2: a star centered at 20;
    // component 3: a lone pair. Node 99 is in no pair and must be absent.
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L),
      (20L, 21L), (20L, 22L), (20L, 23L),
      (30L, 31L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(got == want, s"components: $got")
    assert(!got.contains(99L))

    val resolved = Dedup.resolveClusters(Dedup.dupClusters(pairs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // One canonical keeper per cluster; sizes 4/4/2; purge count = n - clusters.
    assert(resolved.count(_._4 == 1L) == 3)
    assert(resolved.filter(_._2 == 10L).forall(_._3 == 4L))
    assert(resolved.filter(_._2 == 20L).forall(_._3 == 4L))
    assert(resolved.filter(_._2 == 30L).forall(_._3 == 2L))
    assert(resolved.forall { case (id, cl, _, keep) => (keep == 1L) == (id == cl) })
  }

  test("resolveClustersByRank keeps the hub, not the min id; lone pairs keep min id") {
    // Star centered at 25 with leaves 21..24: min-id resolution would
    // keep 21 (the cluster label), but the hub holds most of the rank,
    // so the rank-based pick must keep 25. The lone pair (30, 31) has
    // symmetric ranks — the tie must break to the min id.
    val pairs = Seq((21L, 25L), (22L, 25L), (23L, 25L), (24L, 25L), (30L, 31L))
      .map { case (a, b) => (a, b, 0.8) }.toDF("doc_a", "doc_b", "jaccard")
    val got = Dedup.resolveClustersByRank(pairs, weightCol = Some("jaccard"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    assert(got(25L) == ((21L, 5L, 1L)), s"hub must be the keeper: $got")
    assert((21L to 24L).forall(l => got(l) == ((21L, 5L, 0L))), s"leaves purge: $got")
    assert(got(30L) == ((30L, 2L, 1L)) && got(31L) == ((30L, 2L, 0L)),
      s"symmetric pair ties to min id: $got")
    // Exactly one keeper per cluster, and cluster labels still min-id.
    assert(got.values.count(_._3 == 1L) == 2)
  }

  test("resolveClustersByScore keeps the best-scored member, not the min id; ties to min id") {
    // Component {1,2,3}: doc 3 has the top score -> keep=3, minid 1
    // dropped. Component {10,11}: equal scores -> tie to min id 10.
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val scores = Seq((1L, 0.5), (2L, 0.7), (3L, 0.9), (10L, 0.4), (11L, 0.4))
      .toDF("doc_id", "quality")
    val got = Dedup.resolveClustersByScore(pairs, scores)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster"), r.getAs[Long]("keep")))).toMap
    assert(got(3L) == ((1L, 1L)) && got(1L) == ((1L, 0L)) && got(2L) == ((1L, 0L)),
      s"best quality wins over min id: $got")
    assert(got(10L) == ((10L, 1L)) && got(11L) == ((10L, 0L)),
      s"score tie breaks to min id: $got")
  }

  test("dupClusters converges on a long path (pointer jumping beats diameter)") {
    // A 33-node path: plain propagation needs 32 rounds; propagation +
    // pointer jumping must finish well inside maxIters=30 and still
    // label every node with the path minimum.
    val pairs = (0L until 32L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 33 && got.values.forall(_ == 0L), s"path component: $got")
  }

  test("dupClusters caps plan lineage on high-diameter graphs (localCheckpoint)") {
    // A 129-node path needs >5 propagate+jump rounds, crossing the
    // 5-iteration checkpoint cadence at least once. The returned plan
    // must be rooted past a LogicalRDD (the checkpoint truncation) and
    // bounded in size — without the cap it carries every iteration's
    // join tree and grows with the iteration count.
    val pairs = (0L until 128L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val clusters = Dedup.dupClusters(pairs)
    val got = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 129 && got.values.forall(_ == 0L))
    val plan = clusters.queryExecution.analyzed
    // The post-checkpoint generations still join against the (small)
    // edge-list subtree, so only SOME leaves are LogicalRDD — but at
    // least one must be (the truncated labels generation).
    assert(plan.collectLeaves().exists(_.nodeName == "LogicalRDD"),
      s"expected a checkpoint-truncated leaf, got:\n${plan.treeString}")
    val nodes = plan.collect { case n => n }.size
    // At most (lineageCapEvery - 1) generations of (2 joins + the
    // edge-list union subtree, ~80 nodes each) sit atop the checkpointed
    // LogicalRDD regardless of iteration count (measured: 172 nodes with
    // 2 post-checkpoint generations); the uncapped tree grows with every
    // iteration and passes 600 at 8 iterations.
    assert(nodes < 450, s"plan not lineage-capped: $nodes nodes\n${plan.treeString}")
  }

  // ------------------------------------------------------------- DD-10
  // Substring-level exact dedup (ExactSubstr shape). Driver-side
  // reference implementation for the differential test: literal
  // k-gram counting + island merge + indexed strip over Scala
  // collections — an independent formulation of every stage.
  private def refStrip(ds: Seq[(Long, String)], k: Int)
      : Map[Long, (Long, Long, Long, String)] = {
    val toks = ds.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
    for ((_, t) <- toks; i <- 0 to t.length - k)
      counts.updateWith(t.slice(i, i + k))(c => Some(c.getOrElse(0) + 1))
    toks.map { case (id, t) =>
      val flagged = (0 to t.length - k).filter(i => counts(t.slice(i, i + k)) > 1)
      val spans = flagged.foldLeft(List.empty[(Int, Int)]) { (acc, p) =>
        acc match {
          case (s, e) :: rest if p <= e => (s, math.max(e, p + k)) :: rest
          case _ => (p, p + k) :: acc
        }
      }.reverse
      val covered = spans.flatMap { case (s, e) => s until e }.toSet
      val kept = t.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }
      id -> (t.length.toLong, spans.length.toLong, covered.size.toLong,
        kept.mkString(" "))
    }.toMap
  }

  private def collectStrip(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long, String)] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_removed"), r.getAs[String]("clean_text")))).toMap

  test("stripDuplicateSpans: cross-doc shared run cut as one maximal span") {
    // Docs 0 and 1 share a 12-token run with unique flanks; doc 2 clean.
    val run = (1 to 12).map(i => s"dup$i").mkString(" ")
    val d = Seq(
      (0L, s"a1 a2 a3 $run z1 z2"),
      (1L, s"b1 b2 $run y1 y2 y3"),
      (2L, (1 to 20).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = collectStrip(Dedup.stripDuplicateSpans(d, k = 8))
    // Only windows fully inside the shared run are duplicated (the
    // flanks differ), so the merged span is exactly the 12-token run.
    assert(got(0L) == ((17L, 1L, 12L, "a1 a2 a3 z1 z2")), got(0L).toString)
    assert(got(1L) == ((17L, 1L, 12L, "b1 b2 y1 y2 y3")), got(1L).toString)
    assert(got(2L) == ((20L, 0L, 0L, (1 to 20).map(i => s"c$i").mkString(" "))))
  }

  test("stripDuplicateSpans: within-doc repeat flagged; exact dup fully removed; short doc untouched") {
    val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
    val whole = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (0L, s"u1 u2 u3 $phrase m1 m2 m3 $phrase v1 v2 v3"), // twice in one doc
      (1L, whole), (2L, whole),                            // exact dup pair
      (3L, "s1 s2 s3 s4 s5"))                              // shorter than k
      .toDF("doc_id", "text")
    val got = collectStrip(Dedup.stripDuplicateSpans(d, k = 8))
    assert(got(0L) == ((25L, 2L, 16L, "u1 u2 u3 m1 m2 m3 v1 v2 v3")), got(0L).toString)
    assert(got(1L) == ((30L, 1L, 30L, "")) && got(2L) == ((30L, 1L, 30L, "")))
    assert(got(3L) == ((5L, 0L, 0L, "s1 s2 s3 s4 s5")))
  }

  test("stripDuplicateSpans ≡ driver-side reference on a seeded random corpus") {
    // Deterministic corpus from a tiny vocab so k-gram collisions are
    // plentiful: repeats within docs, across docs, and none at all.
    val rnd = new scala.util.Random(20260814L)
    val vocab = Array("aa", "bb", "cc", "dd")
    val corpus = (0L until 40L).map { id =>
      val n = 6 + rnd.nextInt(30)
      id -> Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val k = 5
    val expected = refStrip(corpus, k)
    val got = collectStrip(
      Dedup.stripDuplicateSpans(corpus.toDF("doc_id", "text"), k))
    assert(got == expected,
      s"diff: ${got.toSet.diff(expected.toSet)} vs ${expected.toSet.diff(got.toSet)}")
  }

  test("prefixJaccardJoin: planted dups found, near-dup thresholds honored, nothing else") {
    // 3-shingle Jaccard on the planted corpus: 0/1 exact (J=1.0);
    // 2 differs from 0 in the LAST token only → exactly one of the 10
    // shingles changes, J = 9/11 ≈ 0.818 — above 4/5, below 9/10.
    val at45 = Dedup.prefixJaccardJoin(docs, tNum = 4, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at45 == Set((0L, 1L), (0L, 2L), (1L, 2L)), at45.toString)
    val strict = Dedup.prefixJaccardJoin(docs, tNum = 9, tDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((0L, 1L)), strict.toString)
  }

  test("prefixJaccardJoin ≡ naive all-pairs on a seeded random corpus (losslessness)") {
    // The prune must be EXACT: same seeded low-vocab corpus style as the
    // strip differential, compared against the brute-force shingle-set
    // join at two thresholds.
    val rnd = new scala.util.Random(20260814L)
    val vocab = Array("aa", "bb", "cc", "dd", "ee")
    val corpus = (0L until 50L).map { id =>
      val n = 4 + rnd.nextInt(12)
      id -> Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }.toDF("doc_id", "text")
    def naive(tNum: Int, tDen: Int): Set[(Long, Long, Double)] = {
      import org.apache.spark.sql.functions._
      val a = corpus.select(col("doc_id").as("doc_a"),
        array_distinct(graft.functions.StringShingles.shingles(col("text"), 3)).as("sa"))
      val b = corpus.select(col("doc_id").as("doc_b"),
        array_distinct(graft.functions.StringShingles.shingles(col("text"), 3)).as("sb"))
      a.crossJoin(b).where(col("doc_a") < col("doc_b"))
        .withColumn("i", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("u", size(col("sa")) + size(col("sb")) - col("i"))
        .where(col("i") * tDen >= col("u") * tNum)
        .select(col("doc_a"), col("doc_b"),
          round(col("i").cast("double") / col("u"), 6).as("j"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    for ((tn, td) <- Seq((4, 5), (3, 5))) {
      val got = Dedup.prefixJaccardJoin(corpus, tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == naive(tn, td),
        s"t=$tn/$td lost or invented pairs: ${got.diff(naive(tn, td))} / ${naive(tn, td).diff(got)}")
    }
  }

  test("embeddingNearDups finds the planted near-identical vector pair") {
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val nearly = v.clone(); nearly(7) = nearly(7) * 1.01f
    val opposite = v.map(x => -x)
    val other = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val embs = Seq((0L, v.toSeq), (1L, nearly.toSeq), (2L, opposite.toSeq), (3L, other.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(embs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((0L, 1L)))
  }
}
