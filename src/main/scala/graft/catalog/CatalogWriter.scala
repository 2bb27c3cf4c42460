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

  /** Restore an array column to its python-literal string form. Null
    * elements render as python `None` (unquoted) — concat would null the
    * whole quoted term and array_join silently drops nulls, shrinking the
    * saved container versus the in-memory one. */
  def renderIterable(c: Column, ct: ContainerType.Value): Column = {
    val quoted = transform(c,
      x => when(x.isNull, lit("None")).otherwise(concat(lit("'"), x, lit("'"))))
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
      val writer   = if (singleFile) restored.coalesce(1) else restored
      writer.write.mode("overwrite").option("header", "true").csv(outDir)
      val target = Paths.get(s"$directory/$csvName")
      if (singleFile) {
        val part = Files.list(Paths.get(outDir)).toArray.map(_.toString)
          .find(p => p.endsWith(".csv")).getOrElse(
            throw new IllegalStateException(s"no csv part written under $outDir"))
        Files.move(Paths.get(part), target, StandardCopyOption.REPLACE_EXISTING)
        // clean the staging dir
        Files.walk(Paths.get(outDir)).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      } else {
        // at-scale mode: the DIRECTORY takes the catalog_file name, so the
        // descriptor the model points at actually exists (spark.read.csv
        // reads part-file directories natively) — the staging dir was
        // previously abandoned, leaving the saved catalog unloadable
        if (Files.exists(target))
          Files.walk(target).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
        Files.move(Paths.get(outDir), target, StandardCopyOption.REPLACE_EXISTING)
      }
      Files.writeString(Paths.get(jsonPath), EsmCatalogModel.toJson(model))
    }
    jsonPath
  }
}
