package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Bloom filter (Bloom 1970) as a bounded bit-position TABLE — the
  * set-membership sketch completing the sketch family next to
  * [[CountMin]] (point counts, overcount-side) and
  * [[HeavyHitters]] (frequent items, undercount-side):
  *
  *   - membership(x) = true for every inserted x (no false negatives);
  *     false positives at rate ≈ (1 − e^(−kn/m))^k for n inserted
  *     items, m bits, k hash rows. One-sided error in the SAFE
  *     direction for a decontamination pre-filter: a gram the filter
  *     passes might be clean (verified exactly downstream), but a gram
  *     it rejects is NEVER in the benchmark.
  *
  * The Spark form is a ≤ m-row table of set bit positions, not a
  * packed bitmap: `build` explodes each item into its k salted-hash
  * positions and a map-side-combined `distinct` bounds the exchange at
  * ≤ m rows per task regardless of item count (the [[CountMin.sketch]]
  * property). Merging filters is set UNION of bit tables — the
  * partial/final split of the distinct IS the mergeable-summaries law.
  *
  * Membership probing ([[filterMembers]]) is k chained BROADCAST
  * left-semi joins, one per hash row — the conjunction "all k bits
  * set" with zero shuffle and no explode/regroup round-trip, so a
  * probe can run map-side BEFORE a corpus shuffle and cut what the
  * shuffle carries to the candidate subset. That ordering — hash the
  * occurrence, drop it early, shuffle only survivors — is the whole
  * 100 TB argument for a Bloom pre-filter in front of an exact
  * contamination join (q_ml7's shape): the exact join's cost scales
  * with candidates, not with the corpus.
  *
  * Hashing is Kirsch–Mitzelmacher double hashing (2006, "Less
  * Hashing, Same Performance"): bit_i = (h1 + i·h2) mod m from TWO
  * md5-parity hexHash60 draws per item — the same asymptotic FP rate
  * as k independent hashes, at 2 hashes for ANY k. This is a
  * probe-driven choice: the first SketchProbe run paid k=4 md5 per
  * gram OCCURRENCE on the corpus side, which dominated the probe's
  * local wall-clock (SCALE.md round-14 table); double hashing halves
  * it and decouples hash cost from k. h2 is forced odd, so with m a
  * power of two the stride is a unit and the k probes never collapse
  * onto a short cycle. Both h-draws fold md5 exactly as the DuckDB
  * oracle does, so the filter's CONTENT — which grams pass, which
  * don't, including false positives — is oracle-certified, not just
  * its error bound.
  */
object Bloom {

  /** The two KM hash draws for `item`: (h1, h2) with h1 ∈ [0, m),
    * h2 odd ∈ [1, m). Salts "b1:"/"b2:" keep the family independent
    * of [[CountMin.bucket]]'s. Both are wrapped non-nullable
    * (coalesce over a literal): a nullable join key makes Spark push
    * an IsNotNull pre-filter that RE-DERIVES the full hash expression
    * per row — the plan audit caught the probe paying its two md5s
    * twice. A null `item` cannot occur on these paths (explode of a
    * non-null shingle array); if one did, it would probe the
    * (0, 1)-stride cells and simply never match a real gram's bits.
    */
  private def h1(item: Column, m: Int): Column =
    coalesce(TextFunctions.hexHash60(concat(lit("b1:"), item)) % m, lit(0L))
  private def h2(item: Column, m: Int): Column =
    coalesce(TextFunctions.hexHash60(concat(lit("b2:"), item)) % m, lit(0L))
      .bitwiseOR(1)

  /** All k bit positions from precomputed draw columns: pure integer
    * arithmetic, no hashing.
    */
  private def kmBits(h1c: Column, h2c: Column, k: Int, m: Int): Column =
    array((0 until k).map(i => (h1c + lit(i.toLong) * h2c) % m): _*)

  /** Build the filter over `items` (string column `item`): the
    * distinct set-bit positions of all k hash rows, as a single-column
    * (`bit`) table of ≤ m rows. One pass; the two hash draws are
    * materialized in their own projection BEFORE the explode, so the
    * generator's k array slots are arithmetic over two attributes —
    * not k·2 inlined md5 calls (the optimizer does not substitute a
    * child projection into generator expressions, which is exactly why
    * the barrier works). The distinct's partial aggregation bounds the
    * exchange at ≤ m rows per task.
    */
  def build(items: DataFrame, k: Int, m: Int): DataFrame = {
    require(k > 0 && m > 0, s"bloom dims must be positive, got k=$k m=$m")
    items.select(h1(col("item"), m).as("__bf_h1"),
        h2(col("item"), m).as("__bf_h2"))
      .select(explode(kmBits(col("__bf_h1"), col("__bf_h2"), k, m)).as("bit"))
      .distinct()
  }

  /** Pack the ≤ m-row bit table into an ACTUAL m-bit bitmap: one row,
    * one `array<long>` of m/64 words — m = 2²⁵ is 512 KB where the
    * row-table broadcast was ~9.6M rows (the SketchProbe finding this
    * exists to close: the scaled-m leg's broadcast build dominated its
    * wall-clock and needed a bigger driver heap). One bounded
    * aggregate: bit → (word index, 1 << bit%64) → per-word `bit_or`
    * (≤ m/64 rows) → a dense map→array fill. Everything stays
    * declarative, so [[filterMembersPacked]] is still plain Catalyst.
    */
  def packFilter(bloom: DataFrame, m: Int): DataFrame = {
    require(m > 0 && m % 64 == 0, s"bitmap width must be a multiple of 64, got $m")
    val spark = bloom.sparkSession
    val words = bloom.select((col("bit") / 64).cast("long").as("widx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").as("wbit"))
      .groupBy("widx").agg(expr("bit_or(wbit)").as("wval"))
    // Dense fill by position, NOT by map lookup: a first cut filled
    // via element_at over a map_from_arrays of the set words, and
    // element_at on an unsorted catalyst map is a LINEAR scan — at a
    // 37%-saturated m=2^21 that was O(words · set-bits) ≈ 2.5e10
    // compares (SketchProbe measured the leg 10× over the join form
    // it meant to beat). range → left join → sort-by-index keeps the
    // fill O(m/64 log m/64) and distributed.
    spark.range(m / 64L).select(col("id").as("widx"))
      .join(words, Seq("widx"), "left")
      .select(col("widx"), coalesce(col("wval"), lit(0L)).as("wval"))
      .agg(array_sort(collect_list(struct(col("widx"), col("wval"))))
        .as("s"))
      .select(transform(col("s"), x => x.getField("wval")).as("bm"))
  }

  /** [[filterMembers]] over a PACKED bitmap ([[packFilter]]): one
    * native codegen'd [[graft.functions.BloomMightContain]] predicate
    * per row — two md5 draws, k shift-and-mask probes of the bitmap
    * held as a codegen reference object (m/64 longs, 512 KB at
    * m = 2²⁵; the one `head()` pinning it is bounded by construction).
    * No join, no per-row array copy, no re-derived hashes. The road
    * here is instructive and documented in SCALE.md: a 1-row
    * crossJoin memcpy'd the bitmap per occurrence, and a declarative
    * hash-columns + Filter form re-derived the md5s because predicate
    * pushdown substitutes aliases into Filter conditions (FilterExec
    * has no subexpression elimination) — the custom-Expression tier
    * is the first form that actually delivers the packed probe's
    * promise. Semantically identical to the join form (spec-pinned
    * differential); use it when the benchmark side is large enough
    * that the ≤ m-row bit TABLE's broadcast cost bites — the join
    * form remains the default for oracle replay.
    */
  def filterMembersPacked(df: DataFrame, itemCol: String, bloom: DataFrame,
      k: Int, m: Int): DataFrame = {
    require(k > 0 && m > 0, s"bloom dims must be positive, got k=$k m=$m")
    // Bounded pin: the packed bitmap row (m/64 longs), never row data.
    val words: Array[Long] =
      packFilter(bloom, m).head().getSeq[Long](0).toArray
    df.where(graft.functions.BloomMightContain(col(itemCol), words, k, m))
  }

  /** The measured join-form → packed crossover, in INSERTED ITEMS:
    * SCALE.md's round-14 decade table has the packed expression winning
    * from the ~10^5-gram benchmark decade up (and the bit-table join's
    * cost growing with its ≤ k·n-row broadcast build), so past this
    * many inserted items [[filterMembersAuto]] serves the packed form.
    * Below it the join form stays: its broadcast is trivial there, it
    * skips [[packFilter]]'s m/64-word fill job + driver pin, and it is
    * the form the DuckDB oracles replay verbatim.
    */
  val PackedCrossoverItems: Long = 100000L

  /** The auto-selection law, pure so the spec pins it directly: from
    * the filter's SET-BIT count, invert the expected-occupancy formula
    * bits ≈ m·(1 − e^(−kn/m)) to the inserted-item estimate
    * n ≈ −(m/k)·ln(1 − bits/m), and go packed at
    * [[PackedCrossoverItems]]. A saturated filter (bits = m) is the
    * ln(0) → ∞ edge: packed, which is also the right answer (a full
    * bit table is the largest possible broadcast).
    */
  def choosePacked(setBits: Long, k: Int, m: Int): Boolean = {
    require(k > 0 && m > 0, s"bloom dims must be positive, got k=$k m=$m")
    require(setBits >= 0 && setBits <= m, s"setBits $setBits outside [0, $m]")
    if (setBits == m) true
    else {
      val estItems = -(m.toDouble / k) * math.log1p(-setBits.toDouble / m)
      estItems >= PackedCrossoverItems.toDouble
    }
  }

  /** [[filterMembers]] with the join-vs-packed choice made from the
    * filter itself ([[choosePacked]] over the set-bit count — one
    * bounded ≤ m-row count job; pass `nItems` to skip it when the
    * caller already knows the inserted-item count, e.g. a streamed
    * state's meta row). Both forms are row-for-row identical
    * (BloomSpec's differential), so the choice is semantically
    * invisible — it only moves WHERE the filter lives at probe time
    * (broadcast hash relation vs 512 KB-class codegen reference
    * object).
    */
  def filterMembersAuto(df: DataFrame, itemCol: String, bloom: DataFrame,
      k: Int, m: Int, nItems: Option[Long] = None): DataFrame = {
    require(k > 0 && m > 0, s"bloom dims must be positive, got k=$k m=$m")
    // The packed bitmap needs whole 64-bit words; a non-word-aligned m
    // (toy geometries) always serves the join form rather than refusing.
    val (decided, served) = nItems match {
      case Some(n) => (n >= PackedCrossoverItems, bloom)
      case None =>
        // The count must not re-run the bit-table pipeline the probe is
        // about to build again: checkpoint once, count the checkpoint,
        // probe the checkpoint (r15 bench caught the double build as a
        // 1.65x q_ml21 regression).
        val b = graft.util.ScratchCheckpoints.register(bloom.localCheckpoint())
        (choosePacked(b.count(), k, m), b)
    }
    val packed = m % 64 == 0 && decided
    if (packed) filterMembersPacked(df, itemCol, served, k, m)
    else filterMembers(df, itemCol, served, k, m)
  }

  /** Keep exactly the rows of `df` whose `itemCol` the filter might
    * contain (all k bits set): k chained broadcast LeftSemi joins — the
    * bit-wise AND as relational algebra. The two hash draws are
    * precomputed ONCE into scratch columns, so each join condition is
    * pure integer arithmetic. Each join is map-side (the filter is
    * ≤ m rows by construction); rows never shuffle, so the probe
    * composes BEFORE downstream exchanges. Guaranteed superset of the
    * true members (no false negatives). The serving choice between
    * this and [[filterMembersPacked]] is [[filterMembersAuto]]'s.
    */
  def filterMembers(df: DataFrame, itemCol: String, bloom: DataFrame,
      k: Int, m: Int): DataFrame = {
    require(k > 0 && m > 0, s"bloom dims must be positive, got k=$k m=$m")
    val hashed = df.withColumn("__bf_h1", h1(col(itemCol), m))
      .withColumn("__bf_h2", h2(col(itemCol), m))
    (0 until k).foldLeft(hashed) { (acc, i) =>
      acc.join(broadcast(bloom),
        (col("__bf_h1") + lit(i.toLong) * col("__bf_h2")) % m === bloom("bit"),
        "left_semi")
    }.drop("__bf_h1", "__bf_h2")
  }
}
