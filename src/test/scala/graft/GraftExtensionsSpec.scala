package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must make the native expressions
  * SQL-callable in a session built with
  * `spark.sql.extensions=graft.GraftExtensions` — built as its own
  * session (sharing the JVM's SparkContext) so the injection path, not
  * imperative registration, is what's exercised.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("injected functions resolve and evaluate in SQL") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // Same master/parallelism as SparkSpec: if this suite runs first it
      // creates the JVM-wide SparkContext every later suite inherits.
      val spark = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = spark.sql(
        """SELECT float_vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                        array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       string_shingles('a b c d', 3) AS sh""".stripMargin).head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getSeq[String](1) == Seq("a b c", "b c d"))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
