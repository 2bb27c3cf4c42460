package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Catalog-plane reader for kerchunk `reference://` indexes
  * (fsspec reference filesystem, kerchunk v1 JSON).
  *
  * The reference opens these through xarray's zarr engine with
  * `storage_options.fo = urlpath` (intake_esm/source.py:82-86, enum
  * cat.py:56-64). The INDEX itself is pure JSON — no codec involved — so the
  * chunk map is fully enumerable here; only the byte-range decode of the
  * chunks stays behind the engine's connector boundary
  * (EsmDataSource.openAsset).
  *
  * A v1 index is `{"version": 1, "refs": {key: inline-string | [url] |
  * [url, offset, length], ...}}` where keys are zarr paths
  * (`variable/chunk.coords` or `.../.zarray|.zattrs|.zgroup` metadata).
  * The values are HETEROGENEOUS (string or array), so the shred uses
  * Spark 4's VariantType — `parse_json` + `variant_explode` — and runs
  * distributed: a multi-GB index for a peta-scale store shreds in
  * executors, never on the driver.
  */
object KerchunkIndex {

  /** One row per reference entry:
    * (key, variable, member, kind ∈ meta|inline|ref, url, offset, length,
    * inline_value). `variable` is "" for root-level keys; inline values keep
    * their `base64:` prefix when binary.
    */
  def read(spark: SparkSession, path: String,
           storageOptions: Map[String, String] = Map.empty): DataFrame = {
    val raw = spark.read.option("wholetext", "true").options(storageOptions).text(path)
    // variant_explode is a table-valued function — LATERAL over a scoped
    // temp view; the view entry can drop once the plan is analyzed
    val view = "graft_kerchunk_" + java.util.UUID.randomUUID().toString.replace("-", "")
    raw.createOrReplaceTempView(view)
    val entries =
      try spark.sql(
        s"""SELECT e.key AS key, e.value AS value
           | FROM $view AS t,
           | LATERAL variant_explode(variant_get(parse_json(t.value), '$$.refs', 'variant')) AS e
           |""".stripMargin)
      finally spark.catalog.dropTempView(view)
    val member = substring_index(col("key"), "/", -1)
    entries.select(
      col("key"),
      when(col("key").contains("/"),
        expr("substring(key, 1, length(key) - length(substring_index(key, '/', -1)) - 1)"))
        .otherwise(lit("")).as("variable"),
      member.as("member"),
      when(member.startsWith("."), lit("meta"))
        .when(expr("schema_of_variant(value)").startsWith("ARRAY"), lit("ref"))
        .otherwise(lit("inline")).as("kind"),
      expr("try_variant_get(value, '$[0]', 'string')").as("url"),
      expr("try_variant_get(value, '$[1]', 'long')").as("offset"),
      expr("try_variant_get(value, '$[2]', 'long')").as("length"),
      expr("try_variant_get(value, '$', 'string')").as("inline_value"),
    )
  }

  /** Zarr array metadata per variable, parsed from the `.zarray` entries:
    * (variable, dtype, shape, chunks, compressor). These sub-documents have
    * a fixed schema, so plain JSON functions suffice. */
  def arrayMeta(entries: DataFrame): DataFrame =
    entries.filter(col("member") === ".zarray")
      .select(
        col("variable"),
        get_json_object(col("inline_value"), "$.dtype").as("dtype"),
        from_json(get_json_object(col("inline_value"), "$.shape"), ArrayType(LongType)).as("shape"),
        from_json(get_json_object(col("inline_value"), "$.chunks"), ArrayType(LongType)).as("chunks"),
        get_json_object(col("inline_value"), "$.compressor.id").as("compressor"),
      )
}
