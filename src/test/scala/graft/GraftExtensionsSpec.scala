package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions entry point: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves the engine's
  * native codegen'd expressions from PLAIN SQL — the packaging a
  * SQL-only (thrift) client needs. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects the native functions for plain SQL") {
    val orig = TestSpark.spark // also forces the shared context up
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // a NEW session over the same SparkContext — extensions apply at
    // session construction. withExtensions feeds the SAME applyExtensions
    // hook the spark.sql.extensions config string does; the config-string
    // form is read from the SparkContext's conf at CONTEXT start, which a
    // shared test context fixed long ago, so it cannot be exercised here.
    val s2 = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      assert(s2 ne orig, "the test needs a freshly constructed session")
      val r = s2.sql(
        """SELECT rolling_hash('abc') AS h,
          |  quantized_dot(array(0.5D, 1.0D), array(2.0D, 3.0D)) AS q,
          |  weighted_dot(array(0.5D), array(7.0D)) AS w,
          |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c""".stripMargin)
        .head()
      assert(r.getLong(0) ==
        graft.functions.RollingHashExpr.hash("abc".getBytes("UTF-8")))
      assert(r.getLong(1) == 500L * 2000L + 1000L * 3000L)
      assert(r.getLong(2) == 500L * 7L)
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
      // wrong arity must fail with a clean message, not an index error
      val e = intercept[Exception](
        s2.sql("SELECT rolling_hash('a', 'b')").collect())
      val chain = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(chain.contains("expects exactly 1"), s"unhelpful error: $chain")
    } finally {
      // never s2.stop() — it would take the shared SparkContext down
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
