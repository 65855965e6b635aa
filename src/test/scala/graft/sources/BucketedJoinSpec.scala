package graft.sources

import graft.SparkSpec

/** The co-located join story (SURVEY.md §4, "bucketing for co-located
  * joins"): two tables bucketed AND sorted on the join key join with NO
  * shuffle exchange — at 100 TB this is the difference between a
  * re-shuffle of both fact tables and a purely local merge per bucket.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key runs without a shuffle exchange") {
    // (warehouse dir is a static conf — the shared session's default
    // ./spark-warehouse is gitignored; tables are dropped in finally.)
    // Disable auto-broadcast so the join would otherwise shuffle.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "v1")
      val right = (1L to 1000L).map(i => (i, s"s$i")).toDF("k", "v2")
      left.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
      right.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")

      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      assert(joined.count() == 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
