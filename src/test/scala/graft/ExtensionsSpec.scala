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
}
