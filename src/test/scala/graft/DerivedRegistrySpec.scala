package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.derived.{DerivedVariable, DerivedVariableRegistry}

/** Reference: tests/test_derived.py (registry, apply conditions,
  * prefer_derived :88-147, error paths). */
class DerivedRegistrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val ds = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "FLNS")

  test("applies when dependencies present and target absent") {
    val reg = new DerivedVariableRegistry().register(DerivedVariable(
      "FLNS2x", Map("variable" -> Seq("FLNS")),
      df => df.withColumn("FLNS2x", col("FLNS") * 2)))
    val out = reg.updateDatasets(Map("k" -> ds), "variable")("k")
    assert(out.columns.contains("FLNS2x"))
    assert(out.orderBy("id").select("FLNS2x").as[Double].collect().toSeq == Seq(20.0, 40.0))
  }

  test("skips when a dependency is missing") {
    val reg = new DerivedVariableRegistry().register(DerivedVariable(
      "X", Map("variable" -> Seq("NOPE")), df => df.withColumn("X", lit(1))))
    assert(!reg.updateDatasets(Map("k" -> ds), "variable")("k").columns.contains("X"))
  }

  test("present target not overwritten unless prefer_derived") {
    val withTarget = ds.withColumn("FLNS2x", lit(-1.0))
    def reg(prefer: Boolean) = new DerivedVariableRegistry().register(DerivedVariable(
      "FLNS2x", Map("variable" -> Seq("FLNS")),
      df => df.withColumn("FLNS2x", col("FLNS") * 2), preferDerived = prefer))
    val kept = reg(false).updateDatasets(Map("k" -> withTarget), "variable")("k")
    assert(kept.select("FLNS2x").as[Double].collect().toSet == Set(-1.0))
    val replaced = reg(true).updateDatasets(Map("k" -> withTarget), "variable")("k")
    assert(replaced.orderBy("id").select("FLNS2x").as[Double].collect().toSeq == Seq(20.0, 40.0))
  }

  test("skip_on_error suppresses derivation failures") {
    val reg = new DerivedVariableRegistry().register(DerivedVariable(
      "boom", Map("variable" -> Seq("FLNS")),
      _ => throw new RuntimeException("kaboom")))
    intercept[RuntimeException](reg.updateDatasets(Map("k" -> ds), "variable"))
    val out = reg.updateDatasets(Map("k" -> ds), "variable", skipOnError = true)("k")
    assert(out.columns.toSeq == Seq("id", "FLNS"))
  }

  test("search subsets the registry") {
    val reg = new DerivedVariableRegistry()
      .register(DerivedVariable("a", Map.empty, identity))
      .register(DerivedVariable("b", Map.empty, identity))
    assert(reg.search(Seq("b", "c")).keys == Seq("b"))
  }

  test("load by name: object member, provider class, and the no-registry error (derived.py:52-88)") {
    // Scala object exposing a registry member (module-with-member shape)
    val fromObject = DerivedVariableRegistry.load("graft.TestDerivedModule")
    assert(fromObject.keys == Seq("tas_squared"))
    // plain class implementing the provider trait
    val fromClass = DerivedVariableRegistry.load(classOf[TestDerivedProvider].getName)
    assert(fromClass.keys == Seq("tas_squared"))
    // module without a registry member errors, mirroring the reference
    val e = intercept[IllegalArgumentException](
      DerivedVariableRegistry.load("graft.TestEmptyModule"))
    assert(e.getMessage.contains("No DerivedVariableRegistry"))
  }

  test("ServiceLoader discovery merges classpath providers") {
    val reg = DerivedVariableRegistry.loadServices()
    assert(reg.contains("tas_squared"))
  }

  test("load falls through to the class when a registry-less companion object shadows it") {
    val reg = DerivedVariableRegistry.load(classOf[TestProviderWithCompanion].getName)
    assert(reg.keys == Seq("tas_squared"))
  }
}

/** Provider class with an unrelated companion object — load() must not stop
  * at the object. */
final class TestProviderWithCompanion extends graft.derived.DerivedRegistryProvider {
  def registry: DerivedVariableRegistry = TestDerivedModule.registry
}
object TestProviderWithCompanion { val unrelated: Int = 7 }

/** Fixture "module": an object whose member registry `load` must discover. */
object TestDerivedModule {
  val registry: DerivedVariableRegistry = new DerivedVariableRegistry()
    .register(DerivedVariable("tas_squared", Map("variable" -> Seq("tas")),
      df => df.withColumn("tas_squared",
        org.apache.spark.sql.functions.col("tas") * org.apache.spark.sql.functions.col("tas"))))
}

/** Fixture provider for the class + ServiceLoader paths. */
final class TestDerivedProvider extends graft.derived.DerivedRegistryProvider {
  def registry: DerivedVariableRegistry = TestDerivedModule.registry
}

object TestEmptyModule { val notARegistry: String = "nope" }
