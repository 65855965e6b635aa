package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{VectorFunctions => VF}

class FloatVectorDotSpec extends SparkSpec {

  test("native dot == HOF fold bit-for-bit on real embeddings") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = embs.select(col("vec_id"), col("embedding").as("ea")).where(col("vec_id") < 50)
    val b = embs.select(col("vec_id").as("vb"), col("embedding").as("eb"))
      .where(col("vb") >= 50 && col("vb") < 100)
    val pairs = a.crossJoin(b)
    val diff = pairs.select(
      (VF.dot(col("ea"), col("eb")) - VF.dotHof(col("ea"), col("eb"))).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0, s"native and HOF dot differ by $diff")
  }

  test("length mismatch and null elements yield null, matching the HOF fold") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f))).toDF("a", "b")
    val r = df.select(VF.dot(col("a"), col("b")).as("native"),
      VF.dotHof(col("a"), col("b")).as("hof")).head()
    assert(r.isNullAt(0) && r.isNullAt(1), "mismatched lengths: both null")
    val withNullElem = Seq((Seq(Some(1.0f), None), Seq(Some(3.0f), Some(4.0f))))
      .toDF("a", "b")
    val r2 = withNullElem.select(VF.dot(col("a"), col("b")).as("native"),
      VF.dotHof(col("a"), col("b")).as("hof")).head()
    assert(r2.isNullAt(0) && r2.isNullAt(1), "null element: both null")
  }

  test("mixed float/double and double/double sides == HOF fold bit-for-bit") {
    // The round-3 generalization: trained IVF centroids are rounded
    // double arrays dotted against raw float embeddings. Both the mixed
    // and all-double paths (interpreted AND codegen'd) must reproduce
    // the left-to-right double fold exactly.
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 50)
    val paired = embs.select(col("vec_id"), col("embedding").as("f"),
      transform(col("embedding"), x => round(x.cast("double") * 0.73, 6)).as("d"))
    val diffs = paired.select(
      abs(VF.dot(col("f"), col("d")) - VF.dotHof(col("f"), col("d"))).as("fd"),
      abs(VF.dot(col("d"), col("f")) - VF.dotHof(col("d"), col("f"))).as("df"),
      abs(VF.dot(col("d"), col("d")) - VF.dotHof(col("d"), col("d"))).as("dd"))
      .agg(max("fd"), max("df"), max("dd")).head()
    for (i <- 0 until 3) assert(diffs.getDouble(i) == 0.0,
      s"mixed-type native and HOF dot differ (col $i): ${diffs.getDouble(i)}")
  }

  test("null inputs yield null; self-dot is normSq") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    val r = df.select(
      VF.dot(col("a"), col("b")).as("d"),
      VF.normSq(col("a")).as("n")).head()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 5.0)
  }
}
