package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiling — the `SUMMARIZE` / data-quality-gate shape every
  * pipeline runs before trusting a new snapshot: per column, row
  * count, null count, distinct count and min/max, in ONE pass over
  * the data (one aggregate; the per-column breakdown is a 1-row
  * explode of the aggregate's output, never a per-column job).
  *
  * Output is a uniform per-column table, so min/max must serialize
  * type-safely AND cross-engine hash-identically: numerics format as
  * the HALF_UP integer micro-value (`round(x·1e6)` as a bigint
  * string — min/max commute with the monotone scaling, and integer
  * strings are formatting-stable where raw double strings are not),
  * timestamps as epoch-µs strings, strings as themselves. That makes
  * every cell a string two engines can agree on byte-for-byte.
  *
  * Cost stance (the honest part): exact multi-column DISTINCT in one
  * pass is executed by Catalyst's RewriteDistinctAggregates as an
  * Expand — ×(distinct columns) row multiplication before the partial
  * aggregate (the q_rel10g law, measured in SCALE.md). For a profile
  * that is the price of exactness and it is paid ONCE per snapshot;
  * [[approxProfile]] is the 100 TB fast path — approx_count_distinct
  * carries one HLL per column through an ordinary partial+final
  * aggregate (no Expand, no row blowup), with the engine's ±5·rsd
  * envelope. Same shape, same formatting, estimates instead of
  * exacts.
  */
object Profile {

  /** Canonical comparable domain per type — "long" kinds (numerics as
    * the HALF_UP integer micro-value, timestamps as epoch-µs, dates
    * as epoch-days) and the "str" kind (everything else, stringified).
    * min/max commute with each (monotone) mapping, and the canonical
    * value is what [[graft.streaming.ProfileStream]] sketches, so
    * batch and streamed profiles count distincts in the same domain.
    */
  private[graft] def kindOf(dt: DataType): String = dt match {
    case _: NumericType | _: TimestampType | _: TimestampNTZType |
        _: DateType => "long"
    case _ => "str"
  }

  private[graft] def canon(c: Column, dt: DataType): Column = dt match {
    case _: NumericType =>
      round(c.cast("double") * lit(1000000L), 0).cast("long")
    case _: TimestampType => unix_micros(c)
    // Parquet TIMESTAMP(isAdjustedToUTC=false) loads as NTZ; the
    // project-wide UTC session timezone makes naive ≡ instant (the
    // Tables.events convention), so the cast is exact.
    case _: TimestampNTZType => unix_micros(c.cast("timestamp"))
    case _: DateType => unix_date(c).cast("long")
    case _ => c.cast("string")
  }

  private def fmt(c: Column, dt: DataType): Column =
    canon(c, dt).cast("string")

  private def rows(df: DataFrame, cols: Seq[String],
      distinctOf: String => Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"profile: no such column(s): ${bad.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        distinctOf(c).as(s"__nd_$c"),
        fmt(min(col(c)), df.schema(c).dataType).as(s"__min_$c"),
        fmt(max(col(c)), df.schema(c).dataType).as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = array(cols.map { c =>
      struct(lit(c).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_str"),
        col(s"__max_$c").as("max_str"))
    }: _*)
    one.select(explode(perCol).as("p")).select("p.*")
      .orderBy("column_name")
  }

  /** Exact profile: one aggregate pass (the multi-distinct Expand is
    * the exactness price — see the object doc).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    rows(df, cols, c => countDistinct(col(c)))

  /** Approximate profile — the 100 TB snapshot gate: identical shape,
    * n_distinct replaced by the HLL estimate at `rsd`. One ordinary
    * partial+final aggregate, no Expand, no row multiplication.
    */
  def approxProfile(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame =
    rows(df, cols, c => approx_count_distinct(col(c), rsd))
}
