package graft.derived

import org.apache.spark.sql.DataFrame

/** Derived-variable registry (reference: intake_esm/derived.py:14-208).
  *
  * A derived variable = target name + the query selecting its dependencies +
  * a `DataFrame => DataFrame` transform that adds the derived column(s) to a
  * tidy dataset. Simple cases are a single `Column` expression (codegen'd,
  * stays inside whole-stage codegen); nothing here needs a Catalyst extension.
  */
final case class DerivedVariable(
    variable: String,
    query: Map[String, Any],
    derive: DataFrame => DataFrame,
    preferDerived: Boolean = false,
) {
  /** Variables this derived variable depends on (derived.py:102-116). */
  def dependentVariables(variableKeyName: String): Seq[String] =
    query.get(variableKeyName) match {
      case Some(s: String) => Seq(s)
      case Some(xs: Seq[_]) => xs.map(_.toString)
      case _               => Nil
    }
}

/** Implement to publish a registry for [[DerivedVariableRegistry.load]] /
  * ServiceLoader discovery — the JVM's module-import seam. */
trait DerivedRegistryProvider { def registry: DerivedVariableRegistry }

object DerivedVariableRegistry {

  /** Load a registry from a fully-qualified class or Scala object name —
    * the JVM twin of `DerivedVariableRegistry.load(module)`
    * (derived.py:52-88, which imports a module and takes its first
    * `DerivedVariableRegistry` member via `inspect.getmembers`). The named
    * type either implements [[DerivedRegistryProvider]] or exposes a no-arg
    * public method/field of type [[DerivedVariableRegistry]].
    */
  def load(name: String): DerivedVariableRegistry = {
    def extract(instance: Any): Option[DerivedVariableRegistry] = instance match {
      case p: DerivedRegistryProvider => Some(p.registry)
      case other =>
        other.getClass.getMethods
          .find(m => m.getParameterCount == 0 &&
            classOf[DerivedVariableRegistry].isAssignableFrom(m.getReturnType))
          .map(_.invoke(other).asInstanceOf[DerivedVariableRegistry])
    }
    // a Scala `object Foo` compiles to Foo$ (singleton) plus a Foo mirror
    // class with no usable constructor — try the singleton form first, but
    // FALL THROUGH to instantiating the class when the module yields no
    // registry (a provider class may have an unrelated companion object)
    val fromModule =
      try Some(Class.forName(if (name.endsWith("$")) name else name + "$")
        .getField("MODULE$").get(null))
      catch { case _: ClassNotFoundException | _: NoSuchFieldException => None }
    val fromClass = () =>
      try Some(Class.forName(name).getDeclaredConstructor().newInstance(): Any)
      catch { case _: ReflectiveOperationException => None }
    fromModule.flatMap(extract)
      .orElse(fromClass().flatMap(extract))
      .getOrElse(throw new IllegalArgumentException(
        s"No DerivedVariableRegistry found in $name (derived.py:84-88 equivalent)"))
  }

  /** Merge every [[DerivedRegistryProvider]] on the classpath
    * (`META-INF/services`) — ServiceLoader is the idiomatic JVM analog of
    * dropping a registry module on `$PYTHONPATH`. */
  def loadServices(
      loader: ClassLoader = Thread.currentThread().getContextClassLoader,
  ): DerivedVariableRegistry = {
    import scala.jdk.CollectionConverters._
    val r = new DerivedVariableRegistry
    java.util.ServiceLoader.load(classOf[DerivedRegistryProvider], loader)
      .iterator().asScala
      .foreach(p => p.registry.items.foreach { case (_, dv) => r.register(dv) })
    r
  }
}

final class DerivedVariableRegistry {
  private val registry = scala.collection.mutable.LinkedHashMap.empty[String, DerivedVariable]

  /** Register (decorator equivalent, derived.py:62-101). */
  def register(dv: DerivedVariable): this.type = { registry(dv.variable) = dv; this }

  def keys: Seq[String]                        = registry.keys.toSeq
  def items: Seq[(String, DerivedVariable)]    = registry.toSeq
  def get(name: String): Option[DerivedVariable] = registry.get(name)
  def contains(name: String): Boolean          = registry.contains(name)
  def size: Int                                = registry.size

  /** Subset by variable names (derived.py:151-166). */
  def search(variables: Seq[String]): DerivedVariableRegistry = {
    val r = new DerivedVariableRegistry
    registry.filter { case (k, _) => variables.contains(k) }.foreach { case (_, v) => r.register(v) }
    r
  }

  /** Apply derived variables to materialized datasets (derived.py:167-208):
    * applied when the dataset's columns ⊇ the dependent variables and the
    * derived column is absent (or `preferDerived`).
    */
  def updateDatasets(
      datasets: Map[String, DataFrame],
      variableKeyName: String,
      skipOnError: Boolean = false,
  ): Map[String, DataFrame] =
    datasets.map { case (key, ds0) =>
      val updated = registry.values.foldLeft(ds0) { (ds, dv) =>
        val deps = dv.dependentVariables(variableKeyName)
        val applicable = deps.forall(ds.columns.contains) &&
          (!ds.columns.contains(dv.variable) || dv.preferDerived)
        if (!applicable) ds
        else
          try dv.derive(ds)
          catch { case e: Exception => if (skipOnError) ds else throw e }
      }
      key -> updated
    }
}
