package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data-pipeline operators
  * (SURVEY.md §2.6 TXT and DD rows): tokenization, shingling, MinHash
  * signatures, quality/language heuristics, fingerprints.
  *
  * Everything here is built from codegen'd Spark built-ins and
  * higher-order functions — no UDFs — so whole-stage codegen spans stay
  * wide and the same logic is expressible in the DuckDB oracle (lambda
  * `list_*` functions) for exact cross-engine checks.
  *
  * `documents.text` is lowercase single-space-separated tokens
  * (FIXTURES.md §2), so tokenize = split on a literal space; a general
  * corpus would pass a regex instead.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token-count by whitespace (TXT token counting, cheap path). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: alpha runs, digit runs, and single other chars
    * — a deterministic stand-in for a real BPE vocab merge count.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** Contiguous n-token shingles ("n-grams") as space-joined strings; a
    * document shorter than n tokens yields its whole text as the single
    * shingle (identical short docs must still collide in MinHash).
    * Backed by the native codegen expression [[StringShingles]]; the
    * interpreted HOF equivalent is [[shinglesHof]].
    */
  def shingles(text: Column, n: Int): Column = StringShingles.shingles(text, n)

  /** Reference HOF implementation of [[shingles]] (interpreted — ~7×
    * slower at sf0.1; kept as the differential-test witness for the
    * native expression).
    */
  def shinglesHof(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array(text))
  }

  /** Cross-engine 60-bit string hash: the first 15 hex chars of md5,
    * parsed as an integer. Unlike xxhash64 this is computable in any
    * engine with md5 (the DuckDB oracle parses the hex via a
    * `list_reduce` fold — see [[hexHash60Sql]]); costs one md5 per value
    * instead of one xxhash, so hot non-oracled paths keep xxhash64.
    */
  def hexHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side (plan-time) [[hexHash60]] — same first-15-hex-chars-of-
    * md5 integer, for constants baked into plans as literals (e.g. LSH
    * hyperplane weights).
    */
  def hexHash60Local(s: String): Long =
    SignatureHash.md5ParityBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** DuckDB SQL fragment computing [[hexHash60]] of `expr` — identical
    * arithmetic (hex-digit fold), for generated oracle queries.
    */
  def hexHash60Sql(expr: String): String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(substr(md5($expr), 1, 15), ''), " +
      "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), " +
      "(a, b) -> a * 16 + b)"

  /** MinHash permutation parameters — deterministic odd multipliers /
    * offsets (splitmix64-flavored constants). Public-knowledge scheme:
    * h_i(x) = (a_i * h(x) + b_i) mod PRIME, where the base hash h is the
    * caller's choice (xxhash64 on hot paths, [[hexHash60]] for
    * DuckDB-mirrored oracle parity), folded into [0, PRIME);
    * signature_i = min over the doc's shingles.
    *
    * PRIME is 2^31-1 so the affine step stays within a signed 64-bit
    * product ((2^31)² < 2^63) — Spark 4 runs ANSI mode, where a long
    * overflow is an error, not a wrap.
    */
  val MinhashPrime: Long = (1L << 31) - 1 // Mersenne prime 2^31-1
  def minhashParams(numPerms: Int): (Array[Long], Array[Long]) = {
    def splitmix(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val as = Array.tabulate(numPerms)(i => (splitmix(2L * i).abs % (MinhashPrime - 1)) | 1L)
    val bs = Array.tabulate(numPerms)(i => splitmix(2L * i + 1).abs % MinhashPrime)
    (as, bs)
  }

  /** Base hashes for MinHash: shingle strings → [0, PRIME) longs.
    *
    * NOTE: this column-level (per-row array) form exists for composing
    * signatures inside a single row (and as the HOF reference
    * implementation); [[graft.operators.Dedup.minhashNearDups]] uses the
    * native one-pass [[graft.functions.MinHashSignature]] expression
    * over the SAME shingle-string hashing, so with the operator's
    * default (`md5Parity = false`, i.e. xxhash64) the two produce
    * identical signatures for the same shingle array. They stop being
    * interchangeable only across hash families (xxhash64 vs the
    * md5-prefix [[hexHash60]] used for DuckDB-oracle parity) — don't
    * mix the two within one pipeline.
    *
    * Materialize this as its OWN projected column before calling
    * [[minhashSignatureFromHashes]]: the signature references the hash
    * array `numPerms` times, and an un-materialized subtree would be
    * recomputed per permutation (measured 64× slowdown).
    */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => pmod(xxhash64(s), lit(MinhashPrime)))

  /** MinHash signature from a pre-materialized hash column: array of
    * `numPerms` longs, each one `array_min` over the affine-permuted
    * hashes. All map-side; no explode, no shuffle.
    */
  def minhashSignatureFromHashes(hashesCol: Column, numPerms: Int): Column = {
    val (as, bs) = minhashParams(numPerms)
    transform(sequence(lit(0), lit(numPerms - 1)), i => {
      val a = element_at(typedLit(as.toSeq), (i + 1).cast("int"))
      val b = element_at(typedLit(bs.toSeq), (i + 1).cast("int"))
      array_min(transform(hashesCol, h => pmod(h * a + b, lit(MinhashPrime))))
    })
  }

  /** Convenience composition (prefer the two-step form on hot paths —
    * see [[shingleHashes]]).
    */
  def minhashSignature(shingleCol: Column, numPerms: Int): Column =
    minhashSignatureFromHashes(shingleHashes(shingleCol), numPerms)

  /** Token-set Jaccard similarity between two token-array columns
    * (distinct semantics: |A∩B| / |A∪B|).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Exact content fingerprint (md5 of the raw text) — the
    * cross-engine-stable fingerprint used for exact dedup. The rolling
    * polynomial variant is [[rollingFingerprint]].
    */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** Rolling polynomial fingerprint over tokens:
    * fold(acc = (acc * 1000003 + xxhash64(token)) mod 2^61-1). Order
    * sensitive (unlike a token-set hash) so reordered docs fingerprint
    * differently; computed map-side with a single fold.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + pmod(xxhash64(t), lit(MinhashPrime)),
        lit(MinhashPrime)))

  /** Marker-token language scoring: count occurrences of one marker word
    * per candidate language; argmax with fixed tie-break order. A real
    * deployment swaps markers for char-n-gram profiles; the operator shape
    * (per-doc scoring + argmax, no shuffle) is the same.
    */
  val LangMarkers: Seq[(String, String)] = Seq(
    "de" -> "der", "en" -> "the", "es" -> "datos", "fr" -> "le", "zh" -> "shuju")

  def markerCount(text: Column, word: String): Column =
    size(filter(tokens(text), t => t === word)).cast("long")

  /** Predicted language: the marker with the highest count; ties go to the
    * first language in [[LangMarkers]] order; all-zero → "und".
    */
  def langPredict(text: Column): Column = {
    val counts = LangMarkers.map { case (lang, w) => (lang, markerCount(text, w)) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und"): Column) { case ((lang, c), els) =>
      when(c === best && best > 0, lang).otherwise(els)
    }
  }

  /** Stopword ratio over a fixed list (the corpus' function words). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and")
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    size(filter(t, x => x.isInCollection(Stopwords))).cast("double") /
      size(t).cast("double")
  }

  /** Composite quality score: log-length + lexical diversity − stopword
    * density (rounded for cross-engine compare). Mirrors the usual
    * pretraining-corpus quality heuristics (length/stopword/diversity
    * ratios) in a deterministic, SQL-expressible form.
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val uniqRatio = size(array_distinct(t)).cast("double") / nTok
    round(log(nTok + 1.0) + uniqRatio - stopwordRatio(text), 6)
  }
}
