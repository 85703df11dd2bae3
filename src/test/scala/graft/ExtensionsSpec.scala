package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must be loadable the way spark.sql.extensions loads it
  * (zero-arg class by name) and must wire into a SparkSessionExtensions
  * without touching a live session. The rule/function behaviors
  * themselves are covered by PlanSpec (NanosRangePushdown effect on the
  * scan) and CastSpec (json_string_cast semantics) on the shared session,
  * where they install through the lazy path. */
class ExtensionsSpec extends AnyFunSuite {

  test("extension class instantiates by name and injects cleanly") {
    val cls = Class.forName("graft.GraftExtensions")
    val instance = cls.getDeclaredConstructor().newInstance()
      .asInstanceOf[SparkSessionExtensions => Unit]
    instance(new SparkSessionExtensions) // must not throw
  }

  test("wrong arity raises WRONG_NUM_ARGS AnalysisException, not IndexOutOfBounds") {
    import org.apache.spark.sql.AnalysisException
    import org.apache.spark.sql.catalyst.expressions.Literal
    val one = GraftExtensions.unary("quantize_u8")(graft.engine.QuantizeU8.apply)
    val e0 = intercept[AnalysisException] { one(Seq.empty) }
    assert(e0.getMessage.contains("quantize_u8"))
    assert(one(Seq(Literal("x"))).isInstanceOf[graft.engine.QuantizeU8])
    val two = GraftExtensions.binary("int_sq_dist")(graft.engine.IntSqDist.apply)
    val e1 = intercept[AnalysisException] { two(Seq(Literal(1))) }
    assert(e1.getMessage.contains("int_sq_dist") && e1.getMessage.contains("2"))
    assert(two(Seq(Literal(1), Literal(2))).isInstanceOf[graft.engine.IntSqDist])
  }
}
