package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV laws (Beyer et al. SIGMOD 2007): the synopsis is a bottom-k
  * over DISTINCT salted hashes, so it inherits [[Sampling]]'s merge
  * law over the distinct-value space; below k it IS the distinct hash
  * set (estimates turn exact); above k the basic estimator and the
  * ρ-composed intersection land within O(1/√k). Everything is
  * deterministic md5 arithmetic — the property q_rel10h's oracle
  * leans on — so these pins are exact-value, not statistical-retry.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val K = 128
  private def eps(k: Int): Double = 5.0 / math.sqrt((k - 2).toDouble)

  private def ids(lo: Int, hi: Int) = (lo until hi).map(i => s"v$i").toDF("id")

  test("merge law: sig(A ∪ B) == bottomK(sig(A) ∪ sig(B)); duplicates never widen a synopsis") {
    val a = ids(0, 3000)
    val b = ids(2000, 5000)
    val direct = Kmv.signature(a.union(b), "id", K)
      .collect().map(_.getLong(0)).toSeq
    // Merging two signatures = bottom-k of their union (hashes are
    // already final — re-hashing would be wrong, so merge directly).
    val viaUnion = Kmv.signature(a, "id", K)
      .union(Kmv.signature(b, "id", K))
      .distinct().orderBy("kmv_h").limit(K)
      .collect().map(_.getLong(0)).toSeq
    assert(direct == viaUnion, "bottom-k over distinct hashes must merge losslessly")
    // A triplicated corpus has the identical synopsis.
    val dup = Kmv.signature(a.union(a).union(a), "id", K)
      .collect().map(_.getLong(0)).toSeq
    val aSig = Kmv.signature(a, "id", K).collect().map(_.getLong(0)).toSeq
    assert(dup == aSig)
  }

  test("estimator branches: exact below k, within 5/sqrt(k-2) relative above") {
    val small = ids(0, 57)
    val es = Kmv.distinctEstimate(Kmv.signature(small, "id", K), K).head()
    assert(es.getLong(0) == 57L && es.getDouble(1) == 57.0,
      "below k the synopsis is the distinct set — estimate must be exact")
    val big = ids(0, 20000)
    val eb = Kmv.distinctEstimate(Kmv.signature(big, "id", K), K).head()
    assert(eb.getLong(0) == K.toLong)
    assert(math.abs(eb.getDouble(1) - 20000.0) <= eps(K) * 20000.0,
      s"est ${eb.getDouble(1)} vs true 20000 at k=$K")
  }

  test("set algebra: planted overlap recovered within the union-scaled envelope") {
    val a = ids(0, 3000)
    val b = ids(2000, 5000) // union 5000, inter 1000, jaccard 0.2
    val r = Kmv.setAlgebra(
      Kmv.signature(a, "id", K), Kmv.signature(b, "id", K), K).head()
    val estU = r.getAs[Double]("est_union")
    val estI = r.getAs[Double]("est_inter")
    assert(r.getAs[Long]("n_l") == K.toLong)
    assert(math.abs(estU - 5000.0) <= eps(K) * 5000.0, s"union est $estU")
    assert(math.abs(estI - 1000.0) <= eps(K) * 5000.0,
      s"inter est $estI — error is union-scaled, not compounded")
    // Exact branch end-to-end: tiny disjoint sets.
    val r2 = Kmv.setAlgebra(
      Kmv.signature(ids(0, 20), "id", K),
      Kmv.signature(ids(20, 50), "id", K), K).head()
    assert(r2.getAs[Double]("est_union") == 50.0)
    assert(r2.getAs[Double]("est_inter") == 0.0)
    assert(r2.getAs[Double]("jaccard") == 0.0)
  }

  test("guards: k too small refuses") {
    intercept[IllegalArgumentException] {
      Kmv.signature(ids(0, 10), "id", 2)
    }
  }
}
