package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational operator battery over the star schema (SURVEY.md §2.6
  * REL-1..21). The reference's own relational surface is thin — source
  * projection/filter (IoT Rule SQL, README.md:50), group-by avg/max
  * (Kibana aggs, README.md:134-173), CTAS projection
  * (sensor-log-compactor.py:82-84) — so this module is the engine's full
  * relational coverage, one oracle-checked query per REL row.
  *
  * Scale notes (the 100 TB design stance):
  *  - dimension joins (`region`/`nation`/`supplier`) are explicitly
  *    `broadcast()` — no shuffle of the fact side;
  *  - fact-fact joins shuffle on the join key only, and AQE is free to pick
  *    SMJ vs shuffled-hash at runtime;
  *  - every aggregation is partial+final (map-side combine) by
  *    construction — plain `groupBy.agg` with codegen'd built-ins;
  *  - filters/projections sit directly on the scan so parquet pushdown and
  *    column pruning apply.
  */
object RelationalQueries {

  /** REL-1/2/3: scan → pruned projection → conjunctive range filter →
    * computed column (TPC-H Q6-shaped predicate). Filters reach the parquet
    * scan as PushedFilters; only 6 of 11 lineitem columns are read.
    */
  def scanFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1996-01-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")

  val scanFilterSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
      |       l_extendedprice * (1.0 - l_discount) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** REL-4: broadcast hash joins — customer ⋈ nation ⋈ region with both
    * dims broadcast; the fact side never shuffles for the join (only the
    * final group-by exchanges on (r_name, n_name)).
    */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(avg("c_acctbal"), 6).as("avg_bal"))
      .orderBy("r_name", "n_name")

  val joinBroadcastSql: String =
    """SELECT r_name, n_name, count(*) AS n_cust, round(avg(c_acctbal), 6) AS avg_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |              JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** REL-5: large-large equi-join (lineitem ⋈ orders) — shuffles both sides
    * on the orderkey; AQE picks sort-merge vs shuffled-hash at runtime.
    * Sum is rounded to 2dp (fp addition order differs between engines).
    */
  def joinLarge(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        sum("l_quantity").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  val joinLargeSql: String =
    """SELECT o_orderpriority,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |       sum(l_quantity) AS sum_qty,
      |       count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** REL-6: left outer join keeping order-less customers (count of their
    * orders = 0, spend = 0).
    */
  def joinOuter(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("spend"))
      .orderBy("c_custkey")

  val joinOuterSql: String =
    """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
      |       round(coalesce(sum(o_totalprice), 0), 2) AS spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** REL-7: left-semi (EXISTS) and left-anti (NOT EXISTS) joins, tagged and
    * unioned: customers that placed a high-value order vs customers that
    * never ordered.
    */
  def joinSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val big = orders.where(col("o_totalprice") > 200000.0)
    val semi = cust.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_big_order").as("tag"))
    val anti = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_orders").as("tag"))
    semi.unionByName(anti).orderBy("tag", "c_custkey")
  }

  val joinSemiAntiSql: String =
    """SELECT c_custkey, 'has_big_order' AS tag FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
      |UNION ALL
      |SELECT c_custkey, 'no_orders' AS tag FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY tag, c_custkey""".stripMargin

  /** REL-8: theta/range join — supplier pairs within a nation where the
    * first has the lower account balance. Equi on the nation key (so the
    * join still hashes/sorts on a key) with the range predicate as a
    * post-join filter — the shape that survives scale-up, vs a raw
    * crossJoin.
    */
  def joinTheta(spark: SparkSession, dir: String): DataFrame = {
    val s1 = Tables.supplier(spark, dir).select(
      col("s_suppkey").as("k1"), col("s_nationkey").as("nk"), col("s_acctbal").as("b1"))
    val s2 = Tables.supplier(spark, dir).select(
      col("s_suppkey").as("k2"), col("s_nationkey").as("nk2"), col("s_acctbal").as("b2"))
    s1.join(s2, col("nk") === col("nk2") && col("k1") < col("k2") && col("b1") < col("b2"))
      .select(col("nk").as("nationkey"), col("k1"), col("k2"),
        round(col("b2") - col("b1"), 2).as("bal_gap"))
      .orderBy("nationkey", "k1", "k2")
  }

  val joinThetaSql: String =
    """SELECT s1.s_nationkey AS nationkey, s1.s_suppkey AS k1, s2.s_suppkey AS k2,
      |       round(s2.s_acctbal - s1.s_acctbal, 2) AS bal_gap
      |FROM supplier s1 JOIN supplier s2
      |  ON s1.s_nationkey = s2.s_nationkey
      | AND s1.s_suppkey < s2.s_suppkey AND s1.s_acctbal < s2.s_acctbal
      |ORDER BY 1, 2, 3""".stripMargin

  /** REL-9: the TPC-H Q1 pricing-summary shape — multi-key hash aggregate
    * with partial/final split. `sum_qty` is a sum of integral doubles
    * (exact under any addition order); price sums are rounded.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_extendedprice"), 6).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       round(avg(l_extendedprice), 6) AS avg_price,
      |       round(avg(l_discount), 6) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** REL-10: exact distinct counting (the approx/HLL variant is
    * [[approxDistinct]], oracled rows-only).
    */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  val distinctCountsSql: String =
    """SELECT count(DISTINCT l_orderkey) AS n_orders,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(*) AS n_rows
      |FROM lineitem""".stripMargin

  /** REL-10b: approximate distinct via HyperLogLog++ — the scale path for
    * 100 TB cardinality estimation. No DuckDB oracle (different sketch):
    * driver records a rows-only check; the scalatest asserts the estimate
    * is within rsd of the exact count.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))

  /** REL-10d: the HLL error-bound AUDIT as a green-oracle row — the
    * companion that makes the approx path's guarantee itself a
    * CORRECTNESS entry. q_rel10b stays rows-only by contract (the
    * sketch values have no DuckDB equivalent); this query reduces the
    * sketch to the one thing both engines CAN agree on: whether
    * |approx − exact| ≤ 5·rsd·exact (the EventSemanticsSpec tolerance,
    * now certified per run by the oracle compare). The oracle computes
    * the exact counts and pins `within_bound = 1`; a hash match
    * therefore asserts the estimate honored its bound on this corpus.
    * One pass over lineitem computes all six aggregates.
    */
  def approxDistinctAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("a_ord"),
        countDistinct(col("l_orderkey")).as("e_ord"),
        approx_count_distinct(col("l_partkey"), 0.01).as("a_part"),
        countDistinct(col("l_partkey")).as("e_part"),
        approx_count_distinct(col("l_suppkey"), 0.01).as("a_supp"),
        countDistinct(col("l_suppkey")).as("e_supp"))
      .select(explode(array(
        struct(lit("l_orderkey").as("metric"), col("e_ord").as("n_exact"),
          (abs(col("a_ord") - col("e_ord")) <= col("e_ord") * 0.05)
            .cast("long").as("within_bound")),
        struct(lit("l_partkey").as("metric"), col("e_part").as("n_exact"),
          (abs(col("a_part") - col("e_part")) <= col("e_part") * 0.05)
            .cast("long").as("within_bound")),
        struct(lit("l_suppkey").as("metric"), col("e_supp").as("n_exact"),
          (abs(col("a_supp") - col("e_supp")) <= col("e_supp") * 0.05)
            .cast("long").as("within_bound")))).as("r"))
      .select("r.*")
      .orderBy("metric")

  val approxDistinctAuditSql: String =
    """SELECT metric, n_exact, CAST(1 AS BIGINT) AS within_bound FROM (
      |  SELECT 'l_orderkey' AS metric,
      |         count(DISTINCT l_orderkey) AS n_exact FROM lineitem
      |  UNION ALL
      |  SELECT 'l_partkey', count(DISTINCT l_partkey) FROM lineitem
      |  UNION ALL
      |  SELECT 'l_suppkey', count(DISTINCT l_suppkey) FROM lineitem)
      |ORDER BY metric""".stripMargin

  /** q_rel10d's treatment for the OTHER approximate aggregate: Spark's
    * `percentile_approx` (the Greenwald-Khanna quantile summary) carries
    * a rank-error guarantee of N/accuracy; this reduces it to an oracled
    * GREEN row the same way. Pass 1 estimates the three quartiles of
    * `l_extendedprice` at accuracy 100 (one 1-row localCheckpoint pin);
    * pass 2 computes each estimate's exact rank interval
    * [count(x < v) + 1, count(x ≤ v)] in ONE conditional aggregate over
    * a broadcast of that row, and `within_bound` asserts the interval
    * intersects [p·N − εN, p·N + εN] at ε = 0.02 (2× the 1/accuracy
    * guarantee — the same slack discipline as rel10d's 5·rsd). The
    * oracle pins within_bound = 1 per quartile, so a hash match
    * certifies the sketch honored its rank bound on this corpus per
    * run. The estimates themselves stay engine-specific (the carve-out
    * q_rel10b documents); the BOUND is what crosses engines.
    */
  def approxQuantileAudit(spark: SparkSession, dir: String): DataFrame = {
    val ps = Seq(0.25, 0.5, 0.75)
    val li = Tables.lineitem(spark, dir).select(col("l_extendedprice").as("x"))
    val est = li.agg(
        expr("percentile_approx(x, array(0.25D, 0.5D, 0.75D), 100)").as("v"),
        count(lit(1)).as("n"))
      .localCheckpoint()
    val aggs = ps.indices.flatMap { i =>
      Seq(
        sum(when(col("x") < element_at(col("v"), i + 1), 1L).otherwise(0L))
          .as(s"lo_$i"),
        sum(when(col("x") <= element_at(col("v"), i + 1), 1L).otherwise(0L))
          .as(s"hi_$i"))
    } :+ min(col("n")).as("n")
    li.crossJoin(broadcast(est))
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ps.indices.map { i =>
        val p = ps(i)
        struct(
          lit(p).as("pct"),
          col("n"),
          ((col(s"lo_$i") + 1 <= lit(p) * col("n") + lit(0.02) * col("n")) &&
            (col(s"hi_$i") >= lit(p) * col("n") - lit(0.02) * col("n")))
            .cast("long").as("within_bound"))
      }: _*)).as("r"))
      .select("r.*")
      .orderBy("pct")
  }

  val approxQuantileAuditSql: String =
    """SELECT t.pct, (SELECT count(*) FROM lineitem) AS n,
      |       CAST(1 AS BIGINT) AS within_bound
      |FROM (VALUES (0.25), (0.5), (0.75)) t(pct)
      |ORDER BY pct""".stripMargin

  /** REL-10f: DDSketch quantiles with the relative-error guarantee
    * certified per run — the VALUE-error quantile sketch
    * ([[graft.operators.DDSketch]], Masson et al. VLDB 2019) next to
    * q_rel10e's rank-error GK audit: a ≤ ⌈log_γ(max/min)⌉-bucket table
    * (~238 buckets over this price column at α = 1%, vs 60k–600k
    * rows) answers q ∈ {1%, 25%, 50%, 75%, 99%} within relative error
    * α of the exact rank-⌈q·N⌉ order statistic. Unlike
    * percentile_approx the sketch is a plain (bucket, n) TABLE — both
    * engines replay its content exactly (the 9dp-rounded log bucket
    * index), so est is a hash-certified VALUE, not a carve-out; exact
    * truth is the audit's pay-for-truth side (distinct-value
    * cumulative walk — bounded by distinct prices), and within_bound
    * pins |est − exact|/exact ≤ α per run. Mergeability (bucket-count
    * addition) is what [[graft.streaming.DDSketchStream]] builds on —
    * the quantile member of the streamed sketch family.
    */
  def ddQuantile(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.DDSketch
    import org.apache.spark.sql.expressions.Window
    val alpha = 0.01
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val vals = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").as("value"))
    val est = DDSketch.quantiles(DDSketch.sketch(vals, alpha), alpha, qs)
    import spark.implicits._
    // Exact truth from the store-cached distinct-value walk (round 20,
    // [[DDSketch.cachedValueCum]]) — the sketch estimate above stays
    // honestly re-executed per run; only the pay-for-truth cumulative
    // table (previously two more fact scans + a single-partition
    // window per invocation) is the build-once artifact.
    val cum = DDSketch.cachedValueCum(vals)
    val exact = cum.join(broadcast(qs.toDF("q")),
        col("cum") >= greatest(ceil(col("q") * col("total")), lit(1L)))
      .groupBy("q").agg(min("value").as("exact_v"))
    est.join(broadcast(exact), "q") // 5 rows a side — never a sort-merge
      .select(col("q"), col("est"), col("exact_v"),
        round(abs(col("est") - col("exact_v")) / col("exact_v"), 6)
          .as("rel_err"))
      .withColumn("within_bound",
        (col("rel_err") <= alpha).cast("long"))
      .orderBy("q")
  }

  val ddQuantileSql: String = {
    val a = 0.01
    val g = (1 + a) / (1 - a)
    val lnG = math.log(g)
    s"""WITH v AS (SELECT l_extendedprice AS value FROM lineitem
       |           WHERE l_extendedprice > 0),
       |n AS (SELECT count(*) AS total FROM v),
       |sk AS (SELECT CAST(ceil(round(ln(value) / $lnG, 9)) AS BIGINT) AS bucket,
       |              count(*) AS cnt FROM v GROUP BY 1),
       |cum AS (SELECT bucket, sum(cnt) OVER (ORDER BY bucket) AS cum FROM sk),
       |qs AS (SELECT * FROM (VALUES (0.01), (0.25), (0.5), (0.75), (0.99)) t(q)),
       |est AS (SELECT q.q,
       |          round(2 * power($g, min(c.bucket)) / ${g + 1}, 6) AS est
       |        FROM qs q CROSS JOIN n JOIN cum c
       |          ON c.cum >= greatest(CAST(ceil(q.q * n.total) AS BIGINT), 1)
       |        GROUP BY 1),
       |dc AS (SELECT value, count(*) AS c FROM v GROUP BY 1),
       |dcum AS (SELECT value, sum(c) OVER (ORDER BY value) AS cum FROM dc),
       |ex AS (SELECT q.q, min(d.value) AS exact_v
       |       FROM qs q CROSS JOIN n JOIN dcum d
       |         ON d.cum >= greatest(CAST(ceil(q.q * n.total) AS BIGINT), 1)
       |       GROUP BY 1)
       |SELECT e.q, e.est, ex.exact_v,
       |       round(abs(e.est - ex.exact_v) / ex.exact_v, 6) AS rel_err,
       |       CAST(CASE WHEN round(abs(e.est - ex.exact_v) / ex.exact_v, 6)
       |                      <= $a THEN 1 ELSE 0 END AS BIGINT) AS within_bound
       |FROM est e JOIN ex USING (q)
       |ORDER BY q""".stripMargin
  }

  /** REL-10i: the DDSketch COLLAPSING cap in query form (Masson et
    * al. §2.4, [[graft.operators.DDSketch.collapse]]) — q_rel10f's
    * sketch hard-bounded at m = 64 buckets (the price column builds
    * ~238): the cutoff is the 64th-largest bucket index, everything
    * below collapses into it, and the row set certifies the whole
    * collapse law cross-engine: `n_buckets` pins m enforcement,
    * `agrees_uncapped` pins that a quantile answered above the cutoff
    * is the IDENTICAL double the uncapped sketch returns (cumulative
    * counts above the cutoff are untouched), and `within_bound` pins
    * that α survives there. All of it is plain integer/6dp-rounded
    * arithmetic on a bounded table — the oracle replays the collapse
    * exactly, no carve-out. The sketch and its capped form are
    * localCheckpointed once (~238/64 rows): the fact table is scanned
    * once for the sketch and once for the exact-truth walk.
    */
  def ddCappedQuantile(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.DDSketch
    import org.apache.spark.sql.expressions.Window
    val alpha = 0.01
    val m = 64
    val qs = Seq(0.5, 0.9, 0.99)
    val vals = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").as("value"))
    val sk = DDSketch.sketch(vals, alpha).localCheckpoint()
    val capped = DDSketch.collapse(sk, m).localCheckpoint()
    val estC = DDSketch.quantiles(capped, alpha, qs).select("q", "est")
    val estU = DDSketch.quantiles(sk, alpha, qs)
      .select(col("q"), col("est").as("est_uncapped"))
    val nb = capped.agg(count(lit(1)).as("n_buckets"))
    import spark.implicits._
    // Exact truth from the store-cached walk — see ddQuantile; the
    // sketch + collapse above (the laws under audit) re-execute per
    // run off ONE fact scan.
    val cum = DDSketch.cachedValueCum(vals)
    val exact = cum.join(broadcast(qs.toDF("q")),
        col("cum") >= greatest(ceil(col("q") * col("total")), lit(1L)))
      .groupBy("q").agg(min("value").as("exact_v"))
    estC.join(broadcast(estU), "q").join(broadcast(exact), "q")
      .crossJoin(broadcast(nb))
      .select(col("q"), col("est"), col("est_uncapped"), col("n_buckets"),
        (col("est") === col("est_uncapped")).cast("long")
          .as("agrees_uncapped"),
        (round(abs(col("est") - col("exact_v")) / col("exact_v"), 6)
          <= alpha).cast("long").as("within_bound"))
      .orderBy("q")
  }

  val ddCappedQuantileSql: String = {
    val a = 0.01
    val g = (1 + a) / (1 - a)
    val lnG = math.log(g)
    s"""WITH v AS (SELECT l_extendedprice AS value FROM lineitem
       |           WHERE l_extendedprice > 0),
       |n AS (SELECT count(*) AS total FROM v),
       |sk AS (SELECT CAST(ceil(round(ln(value) / $lnG, 9)) AS BIGINT) AS bucket,
       |              count(*) AS cnt FROM v GROUP BY 1),
       |cut AS (SELECT min(bucket) AS cut FROM
       |          (SELECT bucket FROM sk ORDER BY bucket DESC LIMIT 64)),
       |csk AS (SELECT greatest(s.bucket, c.cut) AS bucket, sum(s.cnt) AS cnt
       |        FROM sk s CROSS JOIN cut c GROUP BY 1),
       |nb AS (SELECT count(*) AS n_buckets FROM csk),
       |qs AS (SELECT * FROM (VALUES (0.5), (0.9), (0.99)) t(q)),
       |ccum AS (SELECT bucket, sum(cnt) OVER (ORDER BY bucket) AS cum FROM csk),
       |estc AS (SELECT q.q,
       |           round(2 * power($g, min(c.bucket)) / ${g + 1}, 6) AS est
       |         FROM qs q CROSS JOIN n JOIN ccum c
       |           ON c.cum >= greatest(CAST(ceil(q.q * n.total) AS BIGINT), 1)
       |         GROUP BY 1),
       |ucum AS (SELECT bucket, sum(cnt) OVER (ORDER BY bucket) AS cum FROM sk),
       |estu AS (SELECT q.q,
       |           round(2 * power($g, min(c.bucket)) / ${g + 1}, 6)
       |             AS est_uncapped
       |         FROM qs q CROSS JOIN n JOIN ucum c
       |           ON c.cum >= greatest(CAST(ceil(q.q * n.total) AS BIGINT), 1)
       |         GROUP BY 1),
       |dc AS (SELECT value, count(*) AS c FROM v GROUP BY 1),
       |dcum AS (SELECT value, sum(c) OVER (ORDER BY value) AS cum FROM dc),
       |ex AS (SELECT q.q, min(d.value) AS exact_v
       |       FROM qs q CROSS JOIN n JOIN dcum d
       |         ON d.cum >= greatest(CAST(ceil(q.q * n.total) AS BIGINT), 1)
       |       GROUP BY 1)
       |SELECT e.q, e.est, u.est_uncapped, nb.n_buckets,
       |       CAST(CASE WHEN e.est = u.est_uncapped THEN 1 ELSE 0 END
       |            AS BIGINT) AS agrees_uncapped,
       |       CAST(CASE WHEN round(abs(e.est - ex.exact_v) / ex.exact_v, 6)
       |                      <= $a THEN 1 ELSE 0 END AS BIGINT) AS within_bound
       |FROM estc e JOIN estu u USING (q) JOIN ex USING (q) CROSS JOIN nb
       |ORDER BY q""".stripMargin
  }

  /** REL-10g: HLL SET ALGEBRA bound audit — inclusion–exclusion over
    * three conditional sketches: |A∩B| ≈ hll(A) + hll(B) − hll(A∪B),
    * the no-join answer to "distinct keys in BOTH periods/segments" at
    * 100 TB (OpenSearch's cardinality-intersection dashboards run this
    * shape). The estimator's honest weakness is the audit's point: the
    * three errors COMPOUND (each term is rsd-accurate on its OWN
    * cardinality, so the absolute envelope is rsd-scaled by
    * n_a + n_b + n_union, and the RELATIVE error on a small
    * intersection of large sets can be arbitrarily bad — the regime
    * where q_rel10h's KMV synopsis is the right tool). Three planted
    * scenarios span the regimes: heavy overlap (parts shipped in both
    * halves of the date range), near-total overlap (suppliers with R
    * vs A returns), and a thin intersection (orders holding both a
    * ≤ 10 and a > 40 quantity line). The 18 aggregates run as TWO
    * jobs, and both engine choices are measured: (1) the sketches are
    * DataSketches HLL (`hll_sketch_agg` at lgK = 14, rsd ≈ 0.81% —
    * [[graft.streaming.HllStream]]'s family), NOT
    * `approx_count_distinct`, whose legacy register-per-buffer-column
    * HLL++ layout costs ∝ 1/rsd² (measured 9–11 s for these nine
    * sketches at rsd 0.01 vs 0.9 s for DataSketches at BETTER
    * accuracy); (2) the exact cardinalities avoid conditional
    * countDistincts entirely — fused with the sketches, those plan
    * through RewriteDistinctAggregates' Expand with sketch state
    * dragged across every expanded distinct-group key (minutes at
    * sf0.1; q_rel10d's small 3+3 unconditional fused shape stays at
    * 0.13 s), and even alone the nine-group Expand is 2.5× the cost
    * of [[exactTriple]]'s per-key flag form. The sketches aggregate
    * in one no-Expand single-group pass; the three 1-row exact
    * triples broadcast-cross-join onto it. within_bound pins
    * |est − exact| ≤ 5·rsd·(n_a + n_b + n_union) per run, the
    * q_rel10d slack discipline extended to the composed estimator.
    * The estimates stay engine-specific (the q_rel10b carve-out); the
    * exact cardinalities and the certified bound are what cross
    * engines.
    */
  /** Exact (|A|, |B|, |A∪B|) distinct-key cardinalities for one
    * set-algebra scenario, as a 1-row (ea, eb, eu): per-key boolean
    * flags (groupBy(key).agg(max ca, max cb)) summed in a second
    * aggregate. Two codegen'd hash aggregates over (key, 2 ints) —
    * measured 2.5× faster at sf0.1 than expressing the same nine
    * cardinalities as conditional countDistincts (whose
    * RewriteDistinctAggregates Expand multiplies the corpus by the
    * distinct-group count), and the per-key flag table shuffles
    * key+2 ints, never distinct-group expansions.
    */
  private def exactTriple(li: DataFrame, key: String, ca: Column,
      cb: Column): DataFrame =
    li.groupBy(col(key))
      .agg(max(ca.cast("int")).as("ia"), max(cb.cast("int")).as("ib"))
      .agg(sum(col("ia")).as("ea"), sum(col("ib")).as("eb"),
        sum(greatest(col("ia"), col("ib"))).as("eu"))

  def hllSetAlgebra(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val mid = lit("1995-06-17")
    val scen = Seq(
      ("parts_h1_h2", "l_partkey",
        col("l_shipdate") < mid, col("l_shipdate") >= mid),
      ("supp_r_vs_a", "l_suppkey",
        col("l_returnflag") === "R", col("l_returnflag") === "A"),
      ("orders_lowq_highq", "l_orderkey",
        col("l_quantity") <= 10, col("l_quantity") > 40))
    val lgK = 14
    val rsd = 1.04 / math.sqrt((1 << lgK).toDouble)
    val approxAggs = scen.zipWithIndex.flatMap { case ((_, key, ca, cb), i) =>
      Seq(
        hll_sketch_estimate(hll_sketch_agg(when(ca, col(key)), lit(lgK)))
          .as(s"a_$i"),
        hll_sketch_estimate(hll_sketch_agg(when(cb, col(key)), lit(lgK)))
          .as(s"b_$i"),
        hll_sketch_estimate(hll_sketch_agg(when(ca || cb, col(key)),
          lit(lgK))).as(s"u_$i"))
    }
    val exactTriples = scen.zipWithIndex.map { case ((_, key, ca, cb), i) =>
      broadcast(exactTriple(li, key, ca, cb).select(
        col("ea").as(s"ea_$i"), col("eb").as(s"eb_$i"),
        col("eu").as(s"eu_$i")))
    }
    exactTriples
      .foldLeft(li.agg(approxAggs.head, approxAggs.tail: _*))(_ crossJoin _)
      .select(explode(array(scen.zipWithIndex.map { case ((name, _, _, _), i) =>
        val nInter = col(s"ea_$i") + col(s"eb_$i") - col(s"eu_$i")
        val estInter = col(s"a_$i") + col(s"b_$i") - col(s"u_$i")
        val envelope =
          (col(s"ea_$i") + col(s"eb_$i") + col(s"eu_$i")) * lit(5.0 * rsd)
        struct(
          lit(name).as("scenario"),
          col(s"ea_$i").as("n_a"), col(s"eb_$i").as("n_b"),
          nInter.as("n_inter"),
          (abs(estInter - nInter).cast("double") <= envelope)
            .cast("long").as("within_bound"))
      }: _*)).as("r"))
      .select("r.*")
      .orderBy("scenario")
  }

  val hllSetAlgebraSql: String =
    """SELECT scenario, n_a, n_b, n_inter,
      |       CAST(1 AS BIGINT) AS within_bound FROM (
      |  SELECT 'parts_h1_h2' AS scenario,
      |    count(DISTINCT CASE WHEN l_shipdate < TIMESTAMP '1995-06-17'
      |                        THEN l_partkey END) AS n_a,
      |    count(DISTINCT CASE WHEN l_shipdate >= TIMESTAMP '1995-06-17'
      |                        THEN l_partkey END) AS n_b,
      |    count(DISTINCT CASE WHEN l_shipdate < TIMESTAMP '1995-06-17'
      |                        THEN l_partkey END)
      |      + count(DISTINCT CASE WHEN l_shipdate >= TIMESTAMP '1995-06-17'
      |                            THEN l_partkey END)
      |      - count(DISTINCT l_partkey) AS n_inter
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'supp_r_vs_a',
      |    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END),
      |    count(DISTINCT CASE WHEN l_returnflag = 'A' THEN l_suppkey END),
      |    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
      |      + count(DISTINCT CASE WHEN l_returnflag = 'A' THEN l_suppkey END)
      |      - count(DISTINCT CASE WHEN l_returnflag IN ('R', 'A')
      |                            THEN l_suppkey END)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'orders_lowq_highq',
      |    count(DISTINCT CASE WHEN l_quantity <= 10 THEN l_orderkey END),
      |    count(DISTINCT CASE WHEN l_quantity > 40 THEN l_orderkey END),
      |    count(DISTINCT CASE WHEN l_quantity <= 10 THEN l_orderkey END)
      |      + count(DISTINCT CASE WHEN l_quantity > 40 THEN l_orderkey END)
      |      - count(DISTINCT CASE WHEN l_quantity <= 10 OR l_quantity > 40
      |                            THEN l_orderkey END)
      |  FROM lineitem)
      |ORDER BY scenario""".stripMargin

  /** REL-10h: KMV set algebra with the ESTIMATE itself hash-certified —
    * [[graft.operators.Kmv]] (Beyer et al. SIGMOD 2007) over the same
    * three scenarios as q_rel10g. The contrast IS the query: HLL's
    * intersection needs inclusion–exclusion with compounded error and
    * its register estimate can never cross engines (the q_rel10b
    * carve-out), while the KMV synopsis is a deterministic bottom-k of
    * md5-parity hashes — signatures, h₍k₎, the ρ overlap ratio and
    * the final IEEE divisions are all replayed EXACTLY by the DuckDB
    * oracle, so `est_union`, `jaccard` and `est_inter` are certified
    * VALUES, and the intersection error is O(1/√k) of the union size,
    * not of three independent estimates. Scenarios deliberately cover
    * both estimator branches across the driver SFs: the supplier pair
    * stays under k at sf0.01 (the synopsis IS the distinct set —
    * exact) and crosses to the (k−1)·2⁶⁰/h₍k₎ branch at sf0.1
    * (1000 suppliers > k = 512); the part/order pairs run the
    * estimator branch at both.
    * within_bound re-derives |est_inter − n_inter| ≤ 5/√(k−2) ·
    * n_union on BOTH engines from the same replayed numbers.
    *
    * The QUERY runs the fused two-job plan (the composable
    * [[Kmv.signature]]/[[Kmv.setAlgebra]] API, which KmvSpec pins, ran
    * sixteen small jobs here — 3.6 s of mostly scheduling on the
    * clean board): job 1 computes all SIX signatures in one grouped
    * pass — per-row conditional (scenario, side, hash) entries,
    * distinct, then a ranked prefix per (scenario, side) — and
    * checkpoints the ≤ 6k-row table; job 2 derives union synopses
    * (the bottom-k merge law: rank the distinct union of the two
    * bottom-k's), membership flags, the exact flag-triples (one
    * exploded (scenario, key) pass), and the estimates in a single
    * plan over that checkpoint. The signature exchange carries the
    * per-(scenario, side) DISTINCT hash sets once, instead of
    * scanning the fact table six times.
    */
  def kmvSetAlgebra(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Kmv
    val k = 512
    val eps = 5.0 / math.sqrt((k - 2).toDouble)
    val li = Tables.lineitem(spark, dir)
    val mid = lit("1995-06-17")
    val scen = Seq(
      ("parts_h1_h2", "l_partkey",
        col("l_shipdate") < mid, col("l_shipdate") >= mid),
      ("supp_r_vs_a", "l_suppkey",
        col("l_returnflag") === "R", col("l_returnflag") === "A"),
      ("orders_lowq_highq", "l_orderkey",
        col("l_quantity") <= 10, col("l_quantity") > 40))
    // ONE fact pass (round 20; previously two — a per-row-hashed
    // signature pass plus a flag pass): the distinct (scenario, key)
    // table with side flags feeds BOTH the signatures and the exact
    // triples, and the md5 rank hash runs AFTER the distinct aggregate
    // — over ~|distinct keys| rows instead of the exploded fact stream
    // (guide §2.3 "aggregate before you shuffle"; the hash depends
    // only on the key, so hashing the deduped table is the same set).
    val keyed = li.select(explode(array(
        scen.zipWithIndex.map { case ((_, key, ca, cb), i) =>
          struct(lit(i).as("scen"), col(key).as("kv"),
            ca.cast("int").as("ia"), cb.cast("int").as("ib"))
        }: _*)).as("t"))
      .select("t.*")
    val keyTable = keyed.groupBy("scen", "kv")
      .agg(max("ia").as("ia"), max("ib").as("ib"))
      .localCheckpoint() // ~|distinct keys| rows, built once, read twice
    // Signatures: a side's hash set is the hashes of the distinct keys
    // flagged for that side; distinct AFTER hashing too (two keys that
    // hash-collide must count once — the pre-round-20 semantics).
    val sigs = keyTable
      .select(col("scen"), Kmv.hash(col("kv"), "kmv").as("h"),
        explode(array(
          when(col("ia") === 1, lit(0)),
          when(col("ib") === 1, lit(1)))).as("side"))
      .where(col("side").isNotNull)
      .select("scen", "side", "h")
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("scen", "side").orderBy("h")))
      .where(col("rn") <= k).drop("rn")
      .localCheckpoint() // <= 6k rows, pinned once
    // Union synopsis per scenario off the two bottom-k's (the merge
    // law), plus membership flags inside it.
    val l = sigs.select("scen", "h").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("scen").orderBy("h")))
      .where(col("rn") <= k).drop("rn")
    val stats = l
      .join(sigs.where(col("side") === 0)
        .select(col("scen"), col("h"), lit(1).as("in_a")),
        Seq("scen", "h"), "left")
      .join(sigs.where(col("side") === 1)
        .select(col("scen"), col("h"), lit(1).as("in_b")),
        Seq("scen", "h"), "left")
      .groupBy("scen").agg(
        count(lit(1)).as("n_l"), max(col("h")).as("h_k"),
        coalesce(sum((col("in_a").isNotNull && col("in_b").isNotNull)
          .cast("long")), lit(0L)).as("in_both"))
    // Exact triples off the same distinct-key table.
    val triples = keyTable
      .groupBy("scen").agg(sum("ia").as("ea"), sum("ib").as("eb"),
        sum(greatest(col("ia"), col("ib"))).as("eu"))
    val names = array(scen.map(s => lit(s._1)): _*)
    stats.join(triples, "scen")
      .withColumn("raw_u",
        when(col("n_l") < k, col("n_l").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Kmv.Scale) /
            col("h_k").cast("double")))
      .withColumn("jac",
        when(col("n_l") > 0,
          col("in_both").cast("double") / col("n_l").cast("double"))
          .otherwise(lit(0.0)))
      .select(
        element_at(names, col("scen") + 1).as("scenario"),
        col("eu").as("n_union"),
        (col("ea") + col("eb") - col("eu")).as("n_inter"),
        round(col("raw_u"), 6).as("est_union"),
        round(col("jac"), 6).as("jaccard"),
        round(col("jac") * col("raw_u"), 6).as("est_inter"),
        (abs(col("jac") * col("raw_u") -
          (col("ea") + col("eb") - col("eu")).cast("double")) <=
          lit(eps) * col("eu").cast("double"))
          .cast("long").as("within_bound"))
      .orderBy("scenario")
  }

  val kmvSetAlgebraSql: String = {
    val k = 512
    val eps = 5.0 / math.sqrt((k - 2).toDouble)
    import graft.functions.TextFunctions.hexHash60Sql
    def sig(alias: String, keyExpr: String, cond: String): String = {
      val h = hexHash60Sql(s"'kmv:' || CAST($keyExpr AS VARCHAR)")
      s"$alias AS (SELECT DISTINCT $h AS h FROM lineitem WHERE $cond " +
        s"ORDER BY h LIMIT $k)"
    }
    val scen = Seq(
      ("parts_h1_h2", "l_partkey",
        "l_shipdate < TIMESTAMP '1995-06-17'",
        "l_shipdate >= TIMESTAMP '1995-06-17'"),
      ("supp_r_vs_a", "l_suppkey",
        "l_returnflag = 'R'", "l_returnflag = 'A'"),
      ("orders_lowq_highq", "l_orderkey",
        "l_quantity <= 10", "l_quantity > 40"))
    val ctes = scen.zipWithIndex.flatMap { case ((_, key, ca, cb), i) =>
      Seq(
        sig(s"a$i", key, ca), sig(s"b$i", key, cb),
        s"""l$i AS (SELECT h FROM (SELECT h FROM a$i UNION SELECT h FROM b$i)
           |  ORDER BY h LIMIT $k)""".stripMargin,
        s"""s$i AS (SELECT count(*) AS n_l, max(h) AS h_k,
           |  count(CASE WHEN h IN (SELECT h FROM a$i)
           |              AND h IN (SELECT h FROM b$i) THEN 1 END) AS in_both
           |  FROM l$i)""".stripMargin,
        s"""e$i AS (SELECT
           |  count(DISTINCT CASE WHEN $ca THEN $key END) AS ea,
           |  count(DISTINCT CASE WHEN $cb THEN $key END) AS eb,
           |  count(DISTINCT CASE WHEN ($ca) OR ($cb) THEN $key END) AS eu
           |  FROM lineitem)""".stripMargin,
        s"""r$i AS (SELECT '${scen(i)._1}' AS scenario,
           |  e.eu AS n_union, e.ea + e.eb - e.eu AS n_inter,
           |  CASE WHEN s.n_l < $k THEN CAST(s.n_l AS DOUBLE)
           |       ELSE ${(k - 1).toDouble} * 1.152921504606846976e18
           |            / CAST(s.h_k AS DOUBLE) END AS raw_u,
           |  CASE WHEN s.n_l > 0
           |       THEN CAST(s.in_both AS DOUBLE) / CAST(s.n_l AS DOUBLE)
           |       ELSE 0.0 END AS jac
           |  FROM s$i s CROSS JOIN e$i e)""".stripMargin)
    }
    val body = scen.indices.map { i =>
      s"""SELECT scenario, n_union, n_inter,
         |  round(raw_u, 6) AS est_union, round(jac, 6) AS jaccard,
         |  round(jac * raw_u, 6) AS est_inter,
         |  CAST(CASE WHEN abs(jac * raw_u - n_inter) <= $eps * n_union
         |       THEN 1 ELSE 0 END AS BIGINT) AS within_bound
         |FROM r$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH ${ctes.mkString(",\n")}\n$body\nORDER BY scenario"
  }

  /** REL-9/10 extension: order-statistics battery — exact interpolated
    * percentiles (both engines use linear interpolation over the sorted
    * group) and sample stddev (rounded: Welford accumulation order
    * differs across engines in the last ulps).
    */
  def quantileStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("q25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("q75"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val quantileStatsSql: String =
    """SELECT l_returnflag,
      |       round(quantile_cont(l_quantity, 0.25), 6) AS q25,
      |       round(quantile_cont(l_quantity, 0.5), 6) AS median,
      |       round(quantile_cont(l_quantity, 0.75), 6) AS q75,
      |       round(stddev_samp(l_extendedprice), 4) AS sd_price,
      |       count(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** REL-11: rollup — hierarchical subtotals; NULL grouping slots coalesced
    * to 'ALL' so the engines agree on the sort.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls")

  val rollupAggSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |       sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY 1, 2""".stripMargin

  /** REL-11b: cube — all grouping-set combinations over two keys (the
    * rollup's lattice completion); same ALL-coalescing as [[rollupAgg]].
    */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy("status", "priority")

  val cubeAggSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY 1, 2""".stripMargin

  /** REL-24: scalar-subquery pattern — rows compared against a global
    * aggregate. Spark-first form: the 1-row aggregate cross-joins in as
    * a broadcast (no per-row subquery execution); the oracle uses the
    * literal scalar subquery.
    */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val avgPrice = orders.agg(avg("o_totalprice").as("global_avg"))
    orders.crossJoin(broadcast(avgPrice))
      .where(col("o_totalprice") > col("global_avg") * 1.8)
      .select(col("o_orderkey"), col("o_totalprice"),
        round(col("o_totalprice") / col("global_avg"), 6).as("x_avg"))
      .orderBy("o_orderkey")
  }

  val scalarSubquerySql: String =
    """SELECT o_orderkey, o_totalprice,
      |       round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6) AS x_avg
      |FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8
      |ORDER BY o_orderkey""".stripMargin

  /** REL-12: ranking window functions — top-3 parts per brand by retail
    * price (ties broken by partkey so every rank is deterministic).
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        col("rn"), col("rnk"), col("drnk"))
      .orderBy("p_brand", "rn")
  }

  val windowRankSql: String =
    """SELECT p_brand, p_partkey, p_retailprice, rn, rnk, drnk
      |FROM (SELECT p_brand, p_partkey, p_retailprice,
      |             row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
      |      FROM part WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey))
      |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin

  /** REL-13: analytic window functions with an explicit rows frame — 4-row
    * moving average plus lag/lead per user over event time. One shuffle on
    * user_id; the frame is evaluated in a single sorted pass per partition.
    */
  def windowFrames(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(expr("ts_ns div 1000").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("mavg", round(avg("value").over(w.rowsBetween(-3, 0)), 6))
      .withColumn("prev_value", lag("value", 1).over(w))
      .withColumn("next_value", lead("value", 1).over(w))
      .select(col("user_id"), col("event_id"), col("value"),
        col("mavg"), col("prev_value"), col("next_value"))
      .orderBy("user_id", "event_id")
  }

  val windowFramesSql: String =
    """SELECT user_id, event_id, value,
      |       round(avg(value) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS mavg,
      |       lag(value, 1) OVER w AS prev_value,
      |       lead(value, 1) OVER w AS next_value
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** REL-14: top-k — `orderBy().limit()` compiles to TakeOrderedAndProject:
    * per-partition top-k then a single merge, never a global sort.
    */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .limit(10)

  val topKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** REL-15: set operations. Spark's `union` is bag semantics (UNION ALL) —
    * `.distinct()` restores SQL UNION; `intersect`/`except` are already
    * DISTINCT variants, matching the SQL operators.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val building = cust.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val rich = cust.where(col("c_acctbal") > 5000.0).select(col("c_custkey"))
    val haveOrders = orders.select(col("o_custkey").as("c_custkey"))
    val openOrders = orders.where(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    building.union(rich).distinct()
      .intersect(haveOrders)
      .except(openOrders)
      .orderBy("c_custkey")
  }

  val setOpsSql: String =
    """SELECT c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
      |)
      |INTERSECT
      |SELECT o_custkey AS c_custkey FROM orders
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY c_custkey""".stripMargin

  /** REL-16: string-function battery (all codegen'd built-ins, no UDFs). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 8).as("prefix"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
        when(col("p_name").like("%widget%"), 1L).otherwise(0L).as("is_widget"),
        trim(lit(" padded ")).as("trimmed"))
      .orderBy("p_partkey")

  val stringFuncsSql: String =
    """SELECT p_partkey, upper(p_name) AS uname, length(p_name) AS name_len,
      |       substr(p_name, 1, 8) AS prefix,
      |       len(string_split(p_name, ' ')) AS n_words,
      |       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
      |       concat_ws('#', p_brand, p_type) AS brand_type,
      |       CASE WHEN p_name LIKE '%widget%' THEN CAST(1 AS BIGINT) ELSE 0 END AS is_widget,
      |       trim(' padded ') AS trimmed
      |FROM part ORDER BY p_partkey""".stripMargin

  /** REL-17: date/time battery over o_orderdate; day arithmetic at date
    * granularity, epoch at seconds (both engines agree there; see the
    * project verify skill for the ns-precision trap).
    */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"))
      .agg(
        count(lit(1)).as("n"),
        min(unix_timestamp(col("o_orderdate"))).as("min_epoch"),
        max(datediff(col("o_orderdate"), lit("1990-01-01"))).cast("long").as("max_days_since_1990"),
        countDistinct(date_format(col("o_orderdate"), "yyyy-MM")).as("n_months"))
      .orderBy("y", "q")

  val dateFuncsSql: String =
    """SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q, count(*) AS n,
      |       min(CAST(epoch(o_orderdate) AS BIGINT)) AS min_epoch,
      |       max(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))) AS max_days_since_1990,
      |       count(DISTINCT strftime(o_orderdate, '%Y-%m')) AS n_months
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** REL-18: math battery; transcendental results rounded (libm vs DuckDB
    * may differ in the last ulp).
    */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_orderkey") <= 1000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        floor(col("l_extendedprice")).as("floor_price"),
        ceil(col("l_extendedprice")).as("ceil_price"),
        round(abs(col("l_discount") - 0.05), 2).as("abs_disc"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        round(log(col("l_extendedprice")), 6).as("ln_price"))
      .orderBy("l_orderkey", "l_linenumber")

  val mathFuncsSql: String =
    """SELECT l_orderkey, l_linenumber,
      |       round(sqrt(l_quantity), 6) AS sqrt_qty,
      |       CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
      |       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
      |       round(abs(l_discount - 0.05), 2) AS abs_disc,
      |       pow(l_quantity, 2) AS qty_sq,
      |       round(ln(l_extendedprice), 6) AS ln_price
      |FROM lineitem WHERE l_orderkey <= 1000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** REL-19: array/higher-order functions over the embedding vectors —
    * element access, and `aggregate` folds for sum/L2 norm (cast to double
    * before accumulating; same left-to-right fold as the oracle's
    * list_reduce so the fp result is bit-comparable pre-round).
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).as("first_elem"),
        element_at(col("embedding"), -1).as("last_elem"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")), 6).as("sum_elems"),
        round(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))), 6).as("l2_norm"))
      .orderBy("vec_id")

  val arrayFuncsSql: String =
    """SELECT vec_id, label, len(embedding) AS dim,
      |       embedding[1] AS first_elem,
      |       embedding[len(embedding)] AS last_elem,
      |       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |             list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, b) -> a + b), 6) AS sum_elems,
      |       round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b)), 6) AS l2_norm
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** REL-20: JSON extraction (`get_json_object` ≅ EXP-4's per-key access)
    * grouped by the extracted key.
    */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), round(avg("value"), 6).as("avg_value"))
      .orderBy("k")

  val jsonFuncsSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |       count(*) AS n, round(avg(value), 6) AS avg_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** REL-22: pivot — one column per event_type with per-user counts
    * (explicit value list so the plan needs no extra distinct-values
    * pass; absent combinations coalesced to 0 to match the oracle's
    * filtered counts).
    */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    pivoted.select(col("user_id") +:
      types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("user_id")
  }

  val pivotCountsSql: String =
    """SELECT user_id,
      |       count(*) FILTER (WHERE event_type = 'click') AS click,
      |       count(*) FILTER (WHERE event_type = 'error') AS error,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |       count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** REL-23: unpivot/melt — wide per-flag metrics back to long
    * (metric, value) form; the oracle reproduces it as a UNION ALL of
    * labeled arms.
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum("l_quantity").as("sum_qty"),
        count(lit(1)).cast("double").as("n_rows"))
      .unpivot(Array(col("l_returnflag")), Array(col("sum_qty"), col("n_rows")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")

  val unpivotMetricsSql: String =
    """SELECT l_returnflag, 'sum_qty' AS metric, sum(l_quantity) AS value
      |FROM lineitem GROUP BY 1
      |UNION ALL
      |SELECT l_returnflag, 'n_rows' AS metric, CAST(count(*) AS DOUBLE) AS value
      |FROM lineitem GROUP BY 1
      |ORDER BY l_returnflag, metric""".stripMargin

  /** REL-21: conditional/null handling — CASE WHEN bucket, nullif/coalesce
    * roundtrip.
    */
  def conditional(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        when(col("o_totalprice") > 250000.0, "big")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status2"),
        col("o_totalprice"))
      .groupBy("bucket", "status2")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("bucket", "status2")

  val conditionalSql: String =
    """SELECT CASE WHEN o_totalprice > 250000.0 THEN 'big'
      |            WHEN o_totalprice > 100000.0 THEN 'mid'
      |            ELSE 'small' END AS bucket,
      |       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2,
      |       count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** REL-25: aggregate + HAVING (post-aggregation predicate on both the
    * count and the unrounded average — Catalyst plans it as a Filter
    * above the partial+final aggregate, so map-side combine still runs).
    */
  def havingAgg(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
    // Scale-stable threshold: brands pricier than the global average (a
    // fixed absolute cutoff is meaningless across SFs). The 1-row global
    // aggregate broadcasts, exactly like the REL-24 scalar subquery.
    val global = parts.agg(avg("p_retailprice").as("g_avg"))
    // The 1e-9 margin keeps the predicate stable across engines: both
    // averages carry summation-order ulp noise, and a brand avg landing
    // exactly on the global avg must not flip between Spark and the
    // oracle. (Group gaps in the data are O(1) currency units.)
    parts.groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"), avg("p_retailprice").as("avg_raw"))
      .crossJoin(broadcast(global))
      .where(col("n_parts") >= 3 && col("avg_raw") > col("g_avg") + 1e-9)
      .select(col("p_brand"), col("n_parts"), round(col("avg_raw"), 2).as("avg_price"))
      .orderBy("p_brand")
  }

  val havingAggSql: String =
    """SELECT p_brand, count(*) AS n_parts, round(avg(p_retailprice), 2) AS avg_price
      |FROM part GROUP BY 1
      |HAVING count(*) >= 3
      |   AND avg(p_retailprice) > (SELECT avg(p_retailprice) FROM part) + 1e-9
      |ORDER BY 1""".stripMargin

  /** REL-26: distribution windows — ntile quartiles, percent_rank,
    * cume_dist per market segment (single window sort serves all three).
    */
  def ntilePctRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("c_custkey")
  }

  val ntilePctRankSql: String =
    """SELECT c_custkey, c_mktsegment,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |       round(percent_rank() OVER w, 6) AS pct_rank,
      |       round(cume_dist() OVER w, 6) AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** REL-11c: explicit GROUPING SETS with grouping_id — finer than
    * rollup/cube (REL-11/11b): exactly the detail, per-flag, and grand
    * total sets, one aggregation pass. NULL placeholders are coalesced
    * to 'ALL' so the total sort order is engine-independent (Spark sorts
    * NULLS FIRST, DuckDB NULLS LAST).
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gsets")
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem_gsets
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, rf, ls""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |       coalesce(l_linestatus, 'ALL') AS ls,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY gid, rf, ls""".stripMargin

  /** REL-13b: time-RANGE window frames — each event's trailing-5-minute
    * per-user aggregate (RANGE on the µs value, not ROWS: simultaneous
    * events are frame peers in both engines). The time-series sliding
    * aggregate the ROWS frames of REL-13 can't express.
    */
  def rangeFrames(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-300000000L, 0L)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("value"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_5min"),
        round(sum("value").over(w), 6).as("sum_5min"))
      .orderBy("event_id")
  }

  val rangeFramesSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |       count(*) OVER w AS n_5min,
      |       round(sum(value) OVER w, 6) AS sum_5min
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- REL-27
  /** Correlated EXISTS / NOT EXISTS subqueries, written as SQL through
    * the [[graft.Engine.registerTables]] surface (the Athena-analog user
    * path). Catalyst DECORRELATES both: the plan is one left-semi and
    * one left-anti join against orders — never a per-customer subquery
    * execution (guarded in PlanAuditSpec). At 100 TB both joins shuffle
    * on o_custkey/c_custkey only.
    */
  def existsSubquery(spark: SparkSession, dir: String): DataFrame = {
    graft.Engine.registerTables(spark, dir)
    spark.sql(
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F' AND o.o_totalprice < 50000)
        |ORDER BY c_custkey""".stripMargin)
  }

  val existsSubquerySql: String =
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'F' AND o.o_totalprice < 50000)
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------- REL-7b
  /** Correlated LATERAL subquery via the SQL surface: top-2 customers by
    * balance per nation, the "top-N per group as a join" idiom. Catalyst
    * decorrelates the lateral into a ranked window over the one customer
    * shuffle — same physical shape as the explicit window form, proving
    * the SQL surface covers it; the oracle runs the identical statement
    * (modulo DuckDB's comma-LATERAL spelling).
    */
  def lateralJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.Engine.registerTables(spark, dir)
    spark.sql(
      """SELECT n_name, c_name, c_acctbal
        |FROM nation JOIN LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)
  }

  val lateralJoinSql: String =
    """SELECT n_name, c_name, c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  // ---------------------------------------------------------------- REL-29
  /** MERGE/upsert semantics over a snapshot — the warehouse staple Spark
    * core lacks as a statement (MERGE INTO needs a table format), here
    * as its relational decomposition: a deterministic changeset
    * (deletes: negative balances; updates: BUILDING segment rebalanced;
    * inserts: MACHINERY clones under shifted keys) applied as
    * anti-join → left-join + coalesce → unionByName. Delete precedence
    * over update is explicit in the composition order (the anti-join
    * runs first), matching MERGE's WHEN MATCHED THEN DELETE priority.
    * Shape at scale: one hash join per changeset arm on the snapshot
    * key; real changesets are ≪ the snapshot, so AQE broadcasts them
    * and the snapshot itself never shuffles; output row order is the
    * caller's explicit sort, not a merge artifact.
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val deletes = cust.where(col("c_acctbal") < 0).select("c_custkey")
    val updates = cust.where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), round(col("c_acctbal") * 1.1, 3).as("u_bal"))
    val inserts = cust.where(col("c_mktsegment") === "MACHINERY")
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(lit("new_"), col("c_name")).as("c_name"),
        col("c_nationkey"), lit(0.0).as("c_acctbal"), col("c_mktsegment"))
    cust.join(deletes, Seq("c_custkey"), "left_anti")
      .join(updates, Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        coalesce(col("u_bal"), col("c_acctbal")).as("c_acctbal"),
        col("c_mktsegment"))
      .unionByName(inserts)
      .orderBy("c_custkey")
  }

  val mergeUpsertSql: String =
    """WITH del AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
      |upd AS (SELECT c_custkey, round(c_acctbal * 1.1, 3) AS u_bal
      |        FROM customer WHERE c_mktsegment = 'BUILDING'),
      |ins AS (SELECT c_custkey + 1000000 AS c_custkey,
      |               'new_' || c_name AS c_name, c_nationkey,
      |               0.0 AS c_acctbal, c_mktsegment
      |        FROM customer WHERE c_mktsegment = 'MACHINERY'),
      |base AS (SELECT c.c_custkey, c.c_name, c.c_nationkey,
      |                coalesce(u.u_bal, c.c_acctbal) AS c_acctbal,
      |                c.c_mktsegment
      |         FROM customer c LEFT JOIN upd u USING (c_custkey)
      |         WHERE c.c_custkey NOT IN (SELECT c_custkey FROM del))
      |SELECT * FROM base UNION ALL SELECT * FROM ins
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------- SRC format roundtrips
  /** Deterministic lineitem slice used by the format round-trips:
    * timestamps as µs bigints (the oracle-visible precision) so every
    * wire format carries the identical values.
    */
  private def formatSlice(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_orderkey") % 100 === 7)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"),
        // l_shipdate reads as TIMESTAMP_NTZ; the UTC session makes the
        // LTZ cast instant-preserving, and DuckDB's epoch_us sees the
        // same wall-clock value.
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))

  /** Multiset digest over a re-read slice; compared against the SAME
    * digest DuckDB computes directly from the parquet — equality proves
    * the format round-trip (write + schema-on-read) is lossless.
    */
  private def formatDigest(df: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    df.agg(
      count(lit(1)).as("n_rows"),
      sum("l_orderkey").as("sum_orderkey"),
      sum(pmod(TF.hexHash60(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("ship_us"))), lit(TF.MinhashPrime)))
        .cast("long").as("fp_sum"),
      round(sum("l_quantity"), 2).as("sum_qty"),
      round(sum("l_extendedprice"), 2).as("sum_price"))
  }

  /** SRC format: CSV sink + schema-on-read source. Headers on, explicit
    * read schema (never inferred — inference is a full extra pass at
    * 100 TB and type-guesses are not a contract). Doubles survive CSV
    * because Spark writes shortest-round-trip representations.
    */
  /** Deterministic scratch dir for the side-effecting round-trips: a
    * per-PROCESS fixed path + `mode("overwrite")` instead of a fresh
    * temp dir per invocation — Bench reps and repeated correctness
    * passes within one JVM would otherwise accumulate an orphaned
    * written slice under /tmp per run (overwrite deletes the previous
    * contents before writing). The path embeds the JVM pid so two
    * concurrent processes (a bench run racing a verify run) each get
    * their own slice instead of overwriting each other's mid-read.
    */
  private val scratchToken: Long = ProcessHandle.current().pid()
  private[analytics] def scratchDir(tag: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_scratch_${scratchToken}_$tag")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val out = scratchDir("csv")
    formatSlice(spark, dir).write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_returnflag", StringType), StructField("ship_us", LongType)))
    formatDigest(spark.read.schema(schema).option("header", "true").csv(out))
  }

  /** SRC format: ORC sink + source (typed, so no read schema needed —
    * the footer carries it). The oracle still digests the parquet
    * directly; DuckDB never reads the ORC.
    */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir("orc")
    formatSlice(spark, dir).write.mode("overwrite").orc(out)
    formatDigest(spark.read.orc(out))
  }

  /** SRC format: JSON-lines sink + schema-on-read source — the wire
    * format the reference's whole pipeline speaks (sensor_publish.py
    * json.dumps → Firehose JSON batches → the compactor's JSON SerDe),
    * closed as a lossless round-trip like CSV/ORC. Explicit read
    * schema (inference is a full extra pass at 100 TB); doubles
    * survive because Spark writes shortest-round-trip literals and
    * the reader parses them back to the identical IEEE value.
    */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val out = scratchDir("json")
    formatSlice(spark, dir).write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_returnflag", StringType), StructField("ship_us", LongType)))
    formatDigest(spark.read.schema(schema).json(out))
  }

  /** Shared oracle: the digest computed straight from the parquet. */
  val formatRoundtripSql: String = {
    import graft.functions.{TextFunctions => TF}
    val h = TF.hexHash60Sql("CAST(l_orderkey AS VARCHAR) || '|' || " +
      "CAST(l_linenumber AS VARCHAR) || '|' || l_returnflag || '|' || CAST(ship_us AS VARCHAR)")
    s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkey,
       |       CAST(sum($h % ${TF.MinhashPrime}) AS BIGINT) AS fp_sum,
       |       round(sum(l_quantity), 2) AS sum_qty,
       |       round(sum(l_extendedprice), 2) AS sum_price
       |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       |             l_returnflag, epoch_us(l_shipdate) AS ship_us
       |      FROM lineitem WHERE l_orderkey % 100 = 7)""".stripMargin
  }

  /** REL-30: Z-order (Morton) locality law — the layout lever
    * [[graft.operators.Layout]] writes with, certified as data: every
    * row's 24-bit interleave z(l_orderkey, l_partkey), cut into 64
    * equal z-ranges, and per range the count plus min/max of BOTH
    * keys. Because a contiguous z-range is a union of a few key-space
    * rectangles, both per-bucket spans are far below the global spans
    * simultaneously — the property that makes row-group min/max stats
    * selective for 2-d predicates after a z-order write (LayoutProbe
    * measures the resulting skip ratio; LayoutSpec pins the area law).
    * The interleave and the bucket cut are pure integer arithmetic,
    * replayed exactly by the oracle — a hash match certifies the curve
    * itself, not a property of it.
    */
  def zOrderLocality(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val z = Layout.zValue(col("l_orderkey"), col("l_partkey"), bits = 24)
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), z.as("z"))
      .crossJoin(broadcast(
        Tables.lineitem(spark, dir)
          .select(Layout.zValue(col("l_orderkey"), col("l_partkey"), 24)
            .as("z"))
          .agg(max("z").as("zmax"))))
      // Integer division (Spark's `/` on longs is DOUBLE division, and
      // z·64 can exceed the 53-bit mantissa): `div`, matching the
      // oracle's `//`.
      .withColumn("zbucket", expr("(z * 64) div (zmax + 1)"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"),
        min("l_orderkey").as("min_ok"), max("l_orderkey").as("max_ok"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"))
      .orderBy("zbucket")
  }

  val zOrderLocalitySql: String = {
    val z = graft.operators.Layout.zValueSql("l_orderkey", "l_partkey", 24)
    s"""WITH zt AS (SELECT l_orderkey, l_partkey, $z AS z FROM lineitem),
       |zm AS (SELECT max(z) AS zmax FROM zt)
       |SELECT (z * 64) // (zmax + 1) AS zbucket, count(*) AS n,
       |       min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
       |       min(l_partkey) AS min_pk, max(l_partkey) AS max_pk
       |FROM zt CROSS JOIN zm
       |GROUP BY 1 ORDER BY zbucket""".stripMargin
  }

  /** q_rel31: exact one-pass profile of every lineitem column — the
    * snapshot data-quality gate ([[graft.operators.Profile]]): row/
    * null/distinct counts and type-safe min/max per column from ONE
    * aggregate (the multi-distinct Expand is the exactness price,
    * paid once per snapshot; `Profile.approxProfile` is the
    * Expand-free 100 TB path). Min/max serialize as integer
    * micro-value / epoch-µs / raw strings, so every cell is a string
    * both engines agree on byte-for-byte.
    */
  private val profileCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
    "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

  def profileLineitem(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.profile(Tables.lineitem(spark, dir), profileCols)

  // ---------------------------------------------------------------- REL-32
  /** SCD Type-2 history build — the warehouse's other MERGE face
    * (q_rel29 is SCD-1 apply; this keeps every version): fold an
    * update log into validity intervals per entity. Entity key =
    * (user_id, event_type); tracked attribute = the props tier
    * (`k div 25` — coarse enough that consecutive updates genuinely
    * repeat, so the change-collapse below is load-bearing, ~25% of
    * rows fold into their predecessor). Two laws define SCD-2:
    *
    *  - **change detection**: only a row whose attribute DIFFERS from
    *    the entity's previous row (under the total order ts_us,
    *    event_id) opens a version — `rn = 1 OR tier IS DISTINCT FROM
    *    lag(tier)`; the null-safe compare makes a null tier a real
    *    trackable state, not a wildcard;
    *  - **interval closing**: each version is valid [valid_from,
    *    valid_to) with valid_to = the NEXT version's valid_from
    *    (exclusive upper bound — intervals tile the timeline with no
    *    gaps or overlap), null on the open current version.
    *
    * Shape at scale: both window passes share ONE (user_id,
    * event_type) hash partitioning and ONE (ts_us, event_id) sort —
    * the change filter preserves partitioning AND order, so lead/
    * row_number after it reuse the exchange and the sort (pinned in
    * PlanAuditSpec: exactly one data exchange, one sort below it).
    * History length per entity is bounded by that entity's CHANGE
    * count, not its event count — the collapse is what keeps a
    * 100 TB history table smaller than its log.
    */
  /** The unordered version table shared by the history dump (q_rel32)
    * and the point-in-time read (q_rel34).
    */
  private def scd2Versions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_us"), col("event_id"))
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us"),
        // exact integer division to match DuckDB's `// 25` — both
        // truncate toward zero (measured: −7 // 25 = 0 in DuckDB),
        // and `div` stays in integer space where the old
        // double-divide-then-cast could lose precision above 2^53
        expr("cast(get_json_object(props, '$.k') as bigint) div 25")
          .as("tier"))
    val changes = e
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_tier", lag(col("tier"), 1).over(w))
      .where(col("rn") === 1 || !(col("tier") <=> col("prev_tier")))
    changes
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("event_type"), col("tier"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"),
        col("version"), col("valid_to_us").isNull.as("is_current"))
  }

  def scd2History(spark: SparkSession, dir: String): DataFrame =
    scd2Versions(spark, dir).orderBy("user_id", "event_type", "version")

  val scd2HistorySql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) // 25 AS tier
      |  FROM events),
      |c AS (
      |  SELECT * FROM (
      |    SELECT user_id, event_type, event_id, ts_us, tier,
      |           row_number() OVER w AS rn, lag(tier) OVER w AS prev_tier
      |    FROM e
      |    WINDOW w AS (PARTITION BY user_id, event_type
      |                 ORDER BY ts_us, event_id))
      |  WHERE rn = 1 OR tier IS DISTINCT FROM prev_tier)
      |SELECT user_id, event_type, tier, ts_us AS valid_from_us,
      |       lead(ts_us) OVER w2 AS valid_to_us,
      |       row_number() OVER w2 AS version,
      |       lead(ts_us) OVER w2 IS NULL AS is_current
      |FROM c
      |WINDOW w2 AS (PARTITION BY user_id, event_type
      |              ORDER BY ts_us, event_id)
      |ORDER BY user_id, event_type, version""".stripMargin

  // ---------------------------------------------------------------- REL-34
  /** Point-in-time read off the SCD-2 history — the payoff of keeping
    * versions: "every entity's state as of T" is a FILTER over the
    * validity intervals (`valid_from ≤ T < valid_to`, null-open
    * current rows included), not a reconstruction pass over the log.
    * Because the intervals tile each entity's timeline (q_rel32's
    * closing law), the filter selects EXACTLY one version per entity
    * alive at T — entities whose first change is after T are absent,
    * which is the correct as-of semantics, not a gap. At 100 TB the
    * history table is the one you'd keep sorted/partitioned on
    * (entity, valid_from); this query's only corpus-scale work is the
    * same one keyed shuffle that built the history.
    */
  def scd2AsOf(spark: SparkSession, dir: String): DataFrame = {
    val t = 1705363200000000L // 2024-01-16T00:00:00Z, mid-corpus
    scd2Versions(spark, dir)
      .where(col("valid_from_us") <= t &&
        (col("valid_to_us").isNull || col("valid_to_us") > t))
      .select(col("user_id"), col("event_type"), col("tier"),
        col("version"), col("valid_from_us"))
      .orderBy("user_id", "event_type")
  }

  val scd2AsOfSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) // 25 AS tier
      |  FROM events),
      |c AS (
      |  SELECT * FROM (
      |    SELECT user_id, event_type, event_id, ts_us, tier,
      |           row_number() OVER w AS rn, lag(tier) OVER w AS prev_tier
      |    FROM e
      |    WINDOW w AS (PARTITION BY user_id, event_type
      |                 ORDER BY ts_us, event_id))
      |  WHERE rn = 1 OR tier IS DISTINCT FROM prev_tier),
      |v AS (
      |  SELECT user_id, event_type, tier, ts_us AS valid_from_us,
      |         lead(ts_us) OVER w2 AS valid_to_us,
      |         row_number() OVER w2 AS version
      |  FROM c
      |  WINDOW w2 AS (PARTITION BY user_id, event_type
      |                ORDER BY ts_us, event_id))
      |SELECT user_id, event_type, tier, version, valid_from_us
      |FROM v
      |WHERE valid_from_us <= 1705363200000000
      |  AND (valid_to_us IS NULL OR valid_to_us > 1705363200000000)
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- REL-35
  /** Interval-weighted time-in-state off the SCD-2 history — the
    * canonical consumer of a version table: "how long does the fleet
    * SPEND in each tier", which a row-count over versions gets wrong
    * (a tier held for a year and one held for a minute are one row
    * each; dwell TIME is the honest weight). Because the intervals
    * tile each entity's timeline (q_rel32's closing law), per-entity
    * dwell sums telescope to exactly (corpus max − first change), so
    * the aggregate is overlap-free BY CONSTRUCTION — no interval
    * arithmetic beyond (valid_to − valid_from), with open current
    * versions closed at the corpus max event time (one 1-row
    * broadcast). All-integer µs sums; the per-type share divides two
    * longs and rounds 6dp identically in both engines. Null tier is a
    * real state and gets its own dwell row (NULLS FIRST pinned both
    * sides). Work at scale = the history build's one keyed shuffle +
    * a ≤ types·tiers final aggregate.
    */
  def scd2Dwell(spark: SparkSession, dir: String): DataFrame = {
    val mx = Tables.events(spark, dir)
      .agg(max(expr("ts_ns div 1000")).as("mx"))
    val byType = Window.partitionBy("event_type")
    scd2Versions(spark, dir)
      .crossJoin(broadcast(mx))
      .withColumn("dwell",
        coalesce(col("valid_to_us"), col("mx")) - col("valid_from_us"))
      .groupBy("event_type", "tier")
      .agg(sum("dwell").as("dwell_us"))
      .withColumn("share",
        round(col("dwell_us") / sum("dwell_us").over(byType), 6))
      .orderBy(col("event_type"), col("tier").asc_nulls_first)
  }

  val scd2DwellSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) // 25 AS tier
      |  FROM events),
      |c AS (
      |  SELECT * FROM (
      |    SELECT user_id, event_type, event_id, ts_us, tier,
      |           row_number() OVER w AS rn, lag(tier) OVER w AS prev_tier
      |    FROM e
      |    WINDOW w AS (PARTITION BY user_id, event_type
      |                 ORDER BY ts_us, event_id))
      |  WHERE rn = 1 OR tier IS DISTINCT FROM prev_tier),
      |v AS (
      |  SELECT user_id, event_type, tier, ts_us AS valid_from_us,
      |         lead(ts_us) OVER w2 AS valid_to_us
      |  FROM c
      |  WINDOW w2 AS (PARTITION BY user_id, event_type
      |                ORDER BY ts_us, event_id)),
      |m AS (SELECT max(ts_us) AS mx FROM e),
      |d AS (
      |  SELECT event_type, tier,
      |         CAST(sum(coalesce(valid_to_us, m.mx) - valid_from_us)
      |              AS BIGINT) AS dwell_us
      |  FROM v CROSS JOIN m GROUP BY 1, 2)
      |SELECT event_type, tier, dwell_us,
      |       round(CAST(dwell_us AS DOUBLE)
      |             / CAST(sum(dwell_us) OVER (PARTITION BY event_type)
      |                    AS DOUBLE), 6) AS share
      |FROM d ORDER BY event_type, tier NULLS FIRST""".stripMargin

  // -------------------------------------------------------------- REL-34b
  /** Pruned point-in-time read off the STREAMED SCD-2 store — the
    * round-19 serving path oracled end-to-end: the store is built ONCE
    * per (JVM, corpus) from the events log (the q_sim5c store-artifact
    * stance — a history store is built once and serves every read; the
    * build is NOT the measured query), and the query itself is
    * [[graft.streaming.Scd2Stream.asOf]] with a key-band predicate
    * pushed BELOW the version window to the parquet scan (whole key
    * partitions drop, so the result is bit-identical to filtering
    * afterwards — the validated-invariance argument in Scd2Stream).
    * The DuckDB oracle replays q_rel34's batch construction restricted
    * to the same band, so a hash match certifies streamed store +
    * pruned serving ≡ batch builder ∘ filter. Band (user 3..9) is
    * non-empty at every SF tier.
    */
  private val scd2StoreLock = new AnyRef

  private def scd2StoreOf(spark: SparkSession, dir: String): String = {
    val root = scratchDir("scd2store_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    val marker = java.nio.file.Paths.get(root, "_BUILT")
    scd2StoreLock.synchronized {
      if (!java.nio.file.Files.exists(marker)) {
        val log = Tables.events(spark, dir).select(
          col("user_id"), col("event_type"),
          expr("ts_ns div 1000").as("ts_us"), col("event_id"),
          expr("cast(get_json_object(props, '$.k') as bigint) div 25")
            .as("tier"))
        graft.streaming.Scd2Stream.pipeline(s"$root/state",
          buckets = 32, compactEvery = 100)(log, 0L)
        java.nio.file.Files.createFile(marker)
      }
    }
    s"$root/state"
  }

  def scd2AsOfPruned(spark: SparkSession, dir: String): DataFrame = {
    val t = 1705363200000000L // q_rel34's mid-corpus instant
    graft.streaming.Scd2Stream.asOf(spark, scd2StoreOf(spark, dir), t,
        keyPredicate = Some(col("user_id").between(3L, 9L)))
      .orderBy("user_id", "event_type")
  }

  val scd2AsOfPrunedSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) // 25 AS tier
      |  FROM events),
      |c AS (
      |  SELECT * FROM (
      |    SELECT user_id, event_type, event_id, ts_us, tier,
      |           row_number() OVER w AS rn, lag(tier) OVER w AS prev_tier
      |    FROM e
      |    WINDOW w AS (PARTITION BY user_id, event_type
      |                 ORDER BY ts_us, event_id))
      |  WHERE rn = 1 OR tier IS DISTINCT FROM prev_tier),
      |v AS (
      |  SELECT user_id, event_type, tier, ts_us AS valid_from_us,
      |         lead(ts_us) OVER w2 AS valid_to_us,
      |         row_number() OVER w2 AS version
      |  FROM c
      |  WINDOW w2 AS (PARTITION BY user_id, event_type
      |                ORDER BY ts_us, event_id))
      |SELECT user_id, event_type, tier, version, valid_from_us
      |FROM v
      |WHERE valid_from_us <= 1705363200000000
      |  AND (valid_to_us IS NULL OR valid_to_us > 1705363200000000)
      |  AND user_id BETWEEN 3 AND 9
      |ORDER BY user_id, event_type""".stripMargin

  // -------------------------------------------------------------- REL-32b
  /** MULTI-attribute SCD-2 — the shape a warehouse user asks for
    * first: the tracked state is a STRUCT of declared columns (here
    * tier = props k div 25 AND flag = floor(value/100)), and a version
    * opens when ANY field differs under the null-safe struct compare
    * (Spark's `<=>` on structs is field-wise with null matching null —
    * the same compare [[graft.operators.SnapshotDiff]] uses; DuckDB's
    * row-value `IS DISTINCT FROM` replays it exactly). Attribute A
    * changing while B holds opens ONE version carrying both fields —
    * never two rows; both fields equal (nulls included) collapses.
    * Everything else — the one shared (entity) partitioning + (ts,
    * event_id) sort, interval closing, version numbering — is
    * q_rel32's verbatim; output flattens the struct so the oracle
    * compares plain columns. [[graft.streaming.Scd2Stream]] runs the
    * same generalization live via `attrType = StructType(...)`.
    */
  def scd2HistoryMulti(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_us"), col("event_id"))
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us"),
        expr("cast(get_json_object(props, '$.k') as bigint) div 25")
          .as("tier"),
        expr("cast(floor(value / 100) as bigint)").as("flag"))
    val changes = e
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_tier", lag(col("tier"), 1).over(w))
      .withColumn("prev_flag", lag(col("flag"), 1).over(w))
      .where(col("rn") === 1 ||
        !(struct(col("tier"), col("flag")) <=>
          struct(col("prev_tier"), col("prev_flag"))))
    changes
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("event_type"), col("tier"), col("flag"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"),
        col("version"), col("valid_to_us").isNull.as("is_current"))
      .orderBy("user_id", "event_type", "version")
  }

  val scd2HistoryMultiSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) // 25 AS tier,
      |         CAST(floor(value / 100) AS BIGINT) AS flag
      |  FROM events),
      |c AS (
      |  SELECT * FROM (
      |    SELECT user_id, event_type, event_id, ts_us, tier, flag,
      |           row_number() OVER w AS rn,
      |           lag(tier) OVER w AS prev_tier,
      |           lag(flag) OVER w AS prev_flag
      |    FROM e
      |    WINDOW w AS (PARTITION BY user_id, event_type
      |                 ORDER BY ts_us, event_id))
      |  WHERE rn = 1
      |     OR (tier, flag) IS DISTINCT FROM (prev_tier, prev_flag))
      |SELECT user_id, event_type, tier, flag, ts_us AS valid_from_us,
      |       lead(ts_us) OVER w2 AS valid_to_us,
      |       row_number() OVER w2 AS version,
      |       lead(ts_us) OVER w2 IS NULL AS is_current
      |FROM c
      |WINDOW w2 AS (PARTITION BY user_id, event_type
      |              ORDER BY ts_us, event_id)
      |ORDER BY user_id, event_type, version""".stripMargin

  // ---------------------------------------------------------------- REL-33
  /** Snapshot diff / CDC delta — "what changed between yesterday's
    * snapshot and today's": the latest-shipped-lineitem state per
    * order at two fixed date cutoffs, diffed into insert/update
    * change rows (before- and after-images). The naive form
    * materializes both snapshots (two window passes) and full-outer
    * joins them; because both snapshots here derive from ONE log,
    * the whole diff FUSES into a single partial+final hash aggregate
    * over a single pruned scan — per order, the current row is a
    * conditional argmax at each cutoff:
    *
    *   new = argmax_{ship<=t2}(ship_us, linenumber),
    *   old = argmax_{ship<=t1}(...) — same aggregate, FILTERed
    *
    * so the diff of two 100 TB snapshots costs one scan of the log
    * slice and one shuffle of ≤ |keys| partial rows — no snapshot is
    * ever materialized, no join runs (pinned in PlanAuditSpec: one
    * exchange, zero joins). Change classes: 'insert' (order first
    * appears in (t1, t2]) and 'update' (a newer shipment displaces
    * the current row); unchanged keys drop. 'delete' is structurally
    * absent — prefix snapshots of an append-only log can only grow;
    * the delete class belongs to changeset APPLY (q_rel29) and the
    * streamed changelog ([[graft.streaming.CowUpsertStream]]), and
    * the general two-arbitrary-tables form (where deletes are real)
    * is [[graft.operators.SnapshotDiff]], certified in its spec.
    * The argmax rides max(struct(...)) — lexicographic struct order,
    * (ship_us, linenumber) is unique per order so the winner is
    * total; DuckDB replays it as arg_max(col, (ship_us, ln)).
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    // Cutoffs as epoch µs at UTC midnight (the session is UTC, so the
    // NTZ→LTZ cast below is instant-preserving and DuckDB's epoch_us
    // sees the same wall-clock values).
    val t1us = 801964800000000L // 1995-06-01T00:00:00Z
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("1996-06-01")) // pushed to the scan
      .select(col("l_orderkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"),
        col("l_linenumber").cast("long").as("ln"), col("l_quantity"))
    val cur = struct(col("ship_us"), col("ln"), col("l_quantity"))
    li.groupBy("l_orderkey")
      .agg(max(cur).as("new_row"),
        max(when(col("ship_us") <= lit(t1us), cur)).as("old_row"))
      .select(col("l_orderkey"),
        when(col("old_row").isNull, lit("insert")).otherwise(lit("update"))
          .as("change"),
        col("old_row.ship_us").as("old_ship_us"),
        col("old_row.ln").as("old_linenumber"),
        col("old_row.l_quantity").as("old_qty"),
        col("new_row.ship_us").as("new_ship_us"),
        col("new_row.ln").as("new_linenumber"),
        col("new_row.l_quantity").as("new_qty"))
      .where(col("old_ship_us").isNull ||
        col("old_ship_us") =!= col("new_ship_us") ||
        col("old_linenumber") =!= col("new_linenumber"))
      .orderBy("l_orderkey")
  }

  val snapshotDiffSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, epoch_us(l_shipdate) AS ship_us,
      |         CAST(l_linenumber AS BIGINT) AS ln, l_quantity
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '1996-06-01 00:00:00'),
      |s AS (
      |  SELECT l_orderkey,
      |         max({'ship_us': ship_us, 'ln': ln, 'q': l_quantity}) AS new_row,
      |         max(CASE WHEN ship_us <= epoch_us(TIMESTAMP '1995-06-01 00:00:00')
      |                  THEN {'ship_us': ship_us, 'ln': ln, 'q': l_quantity} END) AS old_row
      |  FROM li GROUP BY l_orderkey)
      |SELECT l_orderkey,
      |       CASE WHEN old_row IS NULL THEN 'insert' ELSE 'update' END AS change,
      |       old_row.ship_us AS old_ship_us, old_row.ln AS old_linenumber,
      |       old_row.q AS old_qty,
      |       new_row.ship_us AS new_ship_us, new_row.ln AS new_linenumber,
      |       new_row.q AS new_qty
      |FROM s
      |WHERE old_row IS NULL OR old_row.ship_us <> new_row.ship_us
      |   OR old_row.ln <> new_row.ln
      |ORDER BY l_orderkey""".stripMargin

  val profileLineitemSql: String = {
    val types = Map("l_linenumber" -> "num", "l_quantity" -> "num",
      "l_extendedprice" -> "num", "l_discount" -> "num", "l_tax" -> "num",
      "l_orderkey" -> "num", "l_partkey" -> "num", "l_suppkey" -> "num",
      "l_returnflag" -> "str", "l_linestatus" -> "str",
      "l_shipdate" -> "ts")
    def f(agg: String, c: String): String = types(c) match {
      case "num" =>
        s"CAST(CAST(round($agg($c) * 1000000) AS BIGINT) AS VARCHAR)"
      case "ts" => s"CAST(epoch_us($agg($c)) AS VARCHAR)"
      case _ => s"CAST($agg($c) AS VARCHAR)"
    }
    profileCols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |       count(*) - count($c) AS n_null,
         |       count(DISTINCT $c) AS n_distinct,
         |       ${f("min", c)} AS min_str, ${f("max", c)} AS max_str
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }
}
