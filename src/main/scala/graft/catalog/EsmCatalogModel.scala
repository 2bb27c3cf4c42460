package graft.catalog

import org.json4s._
import org.json4s.jackson.JsonMethods

/** ESM catalog JSON-descriptor model.
  *
  * Spark-first re-expression of the reference's pydantic models
  * (reference: intake_esm/cat.py:48-134). Pure driver-side code — no Spark
  * dependency; the descriptor is tiny and parsed once.
  */
object AggregationType extends Enumeration {
  val JoinNew, JoinExisting, Union = Value
  def parse(s: String): Value = s match {
    case "join_new"      => JoinNew
    case "join_existing" => JoinExisting
    case "union"         => Union
    case other           => throw new IllegalArgumentException(s"unknown aggregation type: $other")
  }
  def render(v: Value): String = v match {
    case JoinNew      => "join_new"
    case JoinExisting => "join_existing"
    case Union        => "union"
  }
}

/** Supported asset data formats (reference: intake_esm/cat.py:56-64). */
object DataFormat extends Enumeration {
  val Netcdf, Zarr, Zarr2, Zarr3, Reference, Opendap, Parquet = Value
  def parse(s: String): Value = s match {
    case "netcdf"    => Netcdf
    case "zarr"      => Zarr
    case "zarr2"     => Zarr2
    case "zarr3"     => Zarr3
    case "reference" => Reference
    case "opendap"   => Opendap
    // Engine extension: the harness's assets are parquet.
    case "parquet"   => Parquet
    case other       => throw new IllegalArgumentException(s"unknown data format: $other")
  }
  def render(v: Value): String = v.toString.toLowerCase
}

/** A catalog attribute column (reference: intake_esm/cat.py:67-71). */
final case class Attribute(columnName: String, vocabulary: Option[String] = None)

/** Asset pointer spec: which column holds the path, and the data format —
  * exactly one of `format` / `formatColumnName` (reference: intake_esm/cat.py:74-88).
  */
final case class Assets(
    columnName: String,
    format: Option[String] = None,
    formatColumnName: Option[String] = None,
) {
  require(
    format.isDefined != formatColumnName.isDefined,
    "exactly one of format or format_column_name must be provided (cat.py:81-88)",
  )
}

/** One aggregation rule (reference: intake_esm/cat.py:91-96). */
final case class Aggregation(
    aggType: AggregationType.Value,
    attributeName: String,
    options: Map[String, Any] = Map.empty,
)

/** Aggregation control block (reference: intake_esm/cat.py:99-104). */
final case class AggregationControl(
    variableColumnName: String,
    groupbyAttrs: List[String] = Nil,
    aggregations: List[Aggregation] = Nil,
)

/** The full catalog descriptor (reference: intake_esm/cat.py:107-134).
  * `catalogDict` and `catalogFile` are mutually exclusive.
  */
final case class EsmCatalogModel(
    esmcatVersion: String,
    id: Option[String] = None,
    description: Option[String] = None,
    title: Option[String] = None,
    lastUpdated: Option[String] = None,
    attributes: List[Attribute] = Nil,
    assets: Assets,
    aggregationControl: Option[AggregationControl] = None,
    catalogFile: Option[String] = None,
    catalogDict: Option[List[Map[String, Any]]] = None,
) {
  require(
    !(catalogFile.isDefined && catalogDict.isDefined),
    "catalog_file and catalog_dict are mutually exclusive (cat.py:128-134)",
  )

  def variableColumnName: Option[String] = aggregationControl.map(_.variableColumnName)
  def groupbyAttrs: List[String]         = aggregationControl.map(_.groupbyAttrs).getOrElse(Nil)
}

object EsmCatalogModel {

  private def jToScala(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     => if (i.isValidLong) i.toLong else i
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d
    case JBool(b)    => b
    case JNull       => null
    case JArray(xs)  => xs.map(jToScala)
    case JObject(fs) => fs.map { case (k, x) => k -> jToScala(x) }.toMap
    case JNothing    => null
    case JSet(xs)    => xs.map(jToScala)
  }

  private def str(obj: JValue, field: String): Option[String] =
    (obj \ field) match {
      case JString(s) => Some(s)
      case JInt(i)    => Some(i.toString)
      case _          => None
    }

  /** Parse a descriptor from JSON text. */
  def fromJson(jsonText: String): EsmCatalogModel = {
    val j = JsonMethods.parse(jsonText)

    val attributes = (j \ "attributes") match {
      case JArray(items) =>
        items.map(a => Attribute(str(a, "column_name").getOrElse(""), str(a, "vocabulary").filter(_.nonEmpty)))
      case _ => Nil
    }

    val assetsJ = j \ "assets"
    val assets = Assets(
      columnName = str(assetsJ, "column_name").getOrElse(throw new IllegalArgumentException("assets.column_name missing")),
      format = str(assetsJ, "format"),
      formatColumnName = str(assetsJ, "format_column_name"),
    )

    val aggCtrl = (j \ "aggregation_control") match {
      case o: JObject =>
        val aggs = (o \ "aggregations") match {
          case JArray(items) =>
            items.map { a =>
              Aggregation(
                AggregationType.parse(str(a, "type").getOrElse("")),
                str(a, "attribute_name").getOrElse(""),
                (a \ "options") match {
                  case oo: JObject => jToScala(oo).asInstanceOf[Map[String, Any]]
                  case _           => Map.empty[String, Any]
                },
              )
            }
          case _ => Nil
        }
        val groupby = (o \ "groupby_attrs") match {
          case JArray(items) => items.collect { case JString(s) => s }
          case _             => Nil
        }
        Some(AggregationControl(str(o, "variable_column_name").getOrElse(""), groupby, aggs))
      case _ => None
    }

    val catalogDict = (j \ "catalog_dict") match {
      case JArray(items) =>
        Some(items.map(r => jToScala(r).asInstanceOf[Map[String, Any]]))
      case _ => None
    }

    EsmCatalogModel(
      esmcatVersion = str(j, "esmcat_version").getOrElse("0.1.0"),
      id = str(j, "id"),
      description = str(j, "description"),
      title = str(j, "title"),
      lastUpdated = str(j, "last_updated"),
      attributes = attributes,
      assets = assets,
      aggregationControl = aggCtrl,
      catalogFile = str(j, "catalog_file"),
      catalogDict = catalogDict,
    )
  }

  /** Render the descriptor back to JSON (for `save`, reference cat.py:153-236). */
  def toJson(m: EsmCatalogModel): String = {
    def sOpt(o: Option[String]): JValue = o.map(JString(_)).getOrElse(JNothing)
    def anyToJ(v: Any): JValue = v match {
      case null            => JNull
      case s: String       => JString(s)
      case i: Int          => JInt(BigInt(i))
      case l: Long         => JInt(BigInt(l))
      case d: Double       => JDouble(d)
      case b: Boolean      => JBool(b)
      case xs: Seq[_]      => JArray(xs.map(anyToJ).toList)
      case m: Map[_, _]    => JObject(m.toList.map { case (k, x) => k.toString -> anyToJ(x) })
      case other           => JString(other.toString)
    }
    val fields = List(
      "esmcat_version" -> JString(m.esmcatVersion),
      "attributes" -> JArray(m.attributes.map(a =>
        JObject(List("column_name" -> JString(a.columnName)) ++ a.vocabulary.map(v => "vocabulary" -> JString(v))))),
      "assets" -> JObject(
        List("column_name" -> JString(m.assets.columnName))
          ++ m.assets.format.map(f => "format" -> JString(f))
          ++ m.assets.formatColumnName.map(f => "format_column_name" -> JString(f))),
      "aggregation_control" -> m.aggregationControl.map { ac =>
        JObject(List(
          "variable_column_name" -> JString(ac.variableColumnName),
          "groupby_attrs"        -> JArray(ac.groupbyAttrs.map(JString(_))),
          "aggregations" -> JArray(ac.aggregations.map(a =>
            JObject(List(
              "type"           -> JString(AggregationType.render(a.aggType)),
              "attribute_name" -> JString(a.attributeName),
              "options"        -> anyToJ(a.options),
            )))),
        ))
      }.getOrElse(JNothing: JValue),
      "id"           -> sOpt(m.id),
      "description"  -> sOpt(m.description),
      "title"        -> sOpt(m.title),
      "last_updated" -> sOpt(m.lastUpdated),
      "catalog_file" -> sOpt(m.catalogFile),
      "catalog_dict" -> m.catalogDict.map(rows => JArray(rows.map(anyToJ))).getOrElse(JNothing: JValue),
    ).filterNot(_._2 == JNothing)
    JsonMethods.pretty(JsonMethods.render(JObject(fields)))
  }
}
