package graft.catalog

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Catalog sink (reference: intake_esm/cat.py:153-236 + core.py:512-565).
  *
  * Writes `<name>.json` (descriptor) and, for `catalogType = "file"`,
  * `<name>.csv[.gz]` with iterable columns restored to their original python
  * literal container shape (list/tuple/set — cat.py:215-216; round-trip
  * stability tested by the reference at tests/test_cat.py:148-177).
  *
  * The CSV is produced by the distributed writer (`coalesce(1)` for the
  * single-file contract the reference has); at real scale callers pass
  * `singleFile = false` and get a partitioned directory instead.
  */
object CatalogWriter {
  import CatalogReader.ContainerType

  /** Restore an array column to its python-literal string form. */
  def renderIterable(c: Column, ct: ContainerType.Value): Column = {
    val quoted = transform(c, x => concat(lit("'"), x, lit("'")))
    val body   = array_join(quoted, ", ")
    ct match {
      case ContainerType.TupleT =>
        // single-element tuples need the trailing comma: ('a',)
        when(size(c) === 1, concat(lit("("), body, lit(",)")))
          .otherwise(concat(lit("("), body, lit(")")))
      case ContainerType.SetT  => concat(lit("{"), body, lit("}"))
      case ContainerType.ListT => concat(lit("["), body, lit("]"))
    }
  }

  def restoreIterableColumns(df: DataFrame, dtypes: Map[String, ContainerType.Value]): DataFrame =
    dtypes.foldLeft(df) { case (d, (c, ct)) =>
      if (d.columns.contains(c)) d.withColumn(c, renderIterable(col(c), ct)) else d
    }

  /** Save the catalog: JSON descriptor + CSV asset table.
    * Returns the JSON path. `catalogType = "dict"` inlines the rows into the
    * JSON instead (cat.py:190-207).
    */
  def save(
      cat: EsmCatalog,
      name: String,
      directory: String,
      catalogType: String = "file",
      singleFile: Boolean = true,
  ): String = {
    Files.createDirectories(Paths.get(directory))
    val jsonPath = s"$directory/$name.json"
    val today    = LocalDate.now().toString

    if (catalogType == "dict") {
      val restored = restoreIterableColumns(cat.df, cat.iterableDtypes)
      val rows = DriverGuard.boundedCollect(restored, s"save(catalogType=dict, name='$name')").map { row =>
        row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
      }.toList
      val model = cat.model.copy(id = Some(name), lastUpdated = Some(today),
        catalogFile = None, catalogDict = Some(rows))
      Files.writeString(Paths.get(jsonPath), EsmCatalogModel.toJson(model))
    } else {
      val csvName = s"$name.csv"
      val model = cat.model.copy(id = Some(name), lastUpdated = Some(today),
        catalogFile = Some(csvName), catalogDict = None)
      val restored = restoreIterableColumns(cat.df, cat.iterableDtypes)
      val outDir   = s"$directory/.__graft_csv_$name"
      restored
        .coalesce(if (singleFile) 1 else restored.rdd.getNumPartitions)
        .write.mode("overwrite").option("header", "true").csv(outDir)
      if (singleFile) {
        val part = Files.list(Paths.get(outDir)).toArray.map(_.toString)
          .find(p => p.endsWith(".csv")).getOrElse(
            throw new IllegalStateException(s"no csv part written under $outDir"))
        Files.move(Paths.get(part), Paths.get(s"$directory/$csvName"), StandardCopyOption.REPLACE_EXISTING)
        // clean the staging dir
        Files.walk(Paths.get(outDir)).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
      Files.writeString(Paths.get(jsonPath), EsmCatalogModel.toJson(model))
    }
    jsonPath
  }
}
