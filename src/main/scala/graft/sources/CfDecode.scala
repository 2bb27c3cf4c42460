package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CF-convention decode layer (opt-in `graft.kerchunk.decode=cf`) over the
  * shared chunk-map plane — the unit/mask/time semantics
  * `xarray.open_dataset` applies by default (`mask_and_scale=True`,
  * `decode_times=True`) when the reference hands an asset to xarray
  * (intake_esm/source.py:70-137; the docs' CMIP6 tutorial output depends
  * on it, docs/source/tutorials/loading-cmip6-data.md:144).
  *
  * Everything is a broadcast join of tiny per-variable attribute rows plus
  * per-row column expressions layered on [[KerchunkIndex.decodeCoords]] —
  * no new parser, no shuffle, embarrassingly parallel at 100 TB.
  *
  * Semantics (CF Conventions §8.1 "Packed Data", §4.4 "Time Coordinate"):
  *  - masking compares the RAW stored value against `_FillValue` and
  *    `missing_value` (before unpacking, per CF) → null; a NaN fill also
  *    masks NaN raw values (float equality would miss them);
  *  - unpack = raw * scale_factor + add_offset (each defaulting to the
  *    identity when absent), in double — the widened type xarray picks for
  *    any packed variable;
  *  - a variable whose `units` is `<unit> since <datetime>` decodes to a
  *    `time` timestamp column: epoch parsed from the ISO-ish CF datetime
  *    (`YYYY-M-D[ H:M[:S[.f]]][Z|UTC]`), value scaled by the unit's seconds
  *    (weeks/days/hours/minutes/seconds/milliseconds/microseconds and
  *    their CF spellings). ONLY real-world calendars decode — absent,
  *    `standard`, `gregorian`, `proleptic_gregorian`; any other calendar
  *    (`noleap`, `360_day`, ...) has dates no instant timestamp can
  *    represent, so the decode REFUSES loudly instead of silently shifting
  *    every date (the same reason cftime exists). A time-like units string
  *    whose unit word or epoch fails to parse also refuses loudly.
  *
  * Out of scope (documented, refuse-or-ignore): `valid_range`/`valid_min`/
  * `valid_max` masking and the netCDF-3 `_Unsigned` trick are ignored
  * (attrs pass through untouched); non-standard calendars refuse.
  */
object CfDecode {

  /** CF decode attributes per variable from the `.zattrs` plane:
    * (variable, cf_scale, cf_offset, cf_fill, cf_missing, cf_units,
    * cf_calendar). One tiny row per variable — always broadcast. */
  def cfAttrs(entries: DataFrame): DataFrame =
    entries.filter(col("member") === ".zattrs" && col("variable") =!= "")
      .select(
        col("variable"),
        get_json_object(col("inline_value"), "$.scale_factor").cast("double").as("cf_scale"),
        get_json_object(col("inline_value"), "$.add_offset").cast("double").as("cf_offset"),
        get_json_object(col("inline_value"), "$._FillValue").cast("double").as("cf_fill"),
        get_json_object(col("inline_value"), "$.missing_value").cast("double").as("cf_missing"),
        get_json_object(col("inline_value"), "$.units").as("cf_units"),
        get_json_object(col("inline_value"), "$.calendar").as("cf_calendar"))

  private val unitsRe = "^\\s*([A-Za-z]+)\\s+since\\s+(.+?)\\s*$"
  private val epochRe =
    "^(\\d{1,4})-(\\d{1,2})-(\\d{1,2})(?:[ T](\\d{1,2}):(\\d{1,2})(?::(\\d{1,2}(?:[.]\\d+)?))?)?(?:\\s*(?:Z|UTC))?$"

  private def secondsPerUnit(unit: Column): Column =
    when(unit.isin("days", "day", "d"), 86400.0)
      .when(unit.isin("hours", "hour", "hr", "h"), 3600.0)
      .when(unit.isin("minutes", "minute", "min"), 60.0)
      .when(unit.isin("seconds", "second", "sec", "s"), 1.0)
      .when(unit.isin("milliseconds", "millisecond", "msec", "ms"), 0.001)
      .when(unit.isin("microseconds", "microsecond", "usec", "us"), 1e-6)
      .when(unit.isin("weeks", "week"), 604800.0)

  /** [[KerchunkIndex.decodeCoords]] plus CF decode: `value` becomes the
    * masked + unpacked double, and a `time` timestamp column is non-null
    * exactly for time-coordinate values (standard calendar). Output:
    * (variable, chunk, idx, value, time, dims, coords). */
  def decodeCf(chunks: DataFrame, meta: DataFrame, dims: DataFrame,
               cf: DataFrame): DataFrame = {
    val raw = col("value")
    val fillHit =
      (raw === col("cf_fill")) || (raw === col("cf_missing")) ||
        (isnan(col("cf_fill")) && isnan(raw)) || (isnan(col("cf_missing")) && isnan(raw))
    val unpacked = (raw * coalesce(col("cf_scale"), lit(1.0)) +
      coalesce(col("cf_offset"), lit(0.0)))
    val decoded = when(coalesce(fillHit, lit(false)), lit(null).cast("double"))
      .otherwise(unpacked)

    val timeLike = col("cf_units").isNotNull &&
      col("cf_units").rlike("(?i)^\\s*[A-Za-z]+\\s+since\\s")
    val unitWord = lower(regexp_extract(col("cf_units"), unitsRe, 1))
    val unitSec = secondsPerUnit(unitWord)
    val epochStr = regexp_extract(col("cf_units"), unitsRe, 2)
    def g(i: Int): Column = regexp_extract(epochStr, epochRe, i)
    val epochOk = g(1) =!= ""
    val epochTs = make_timestamp(
      g(1).cast("int"), g(2).cast("int"), g(3).cast("int"),
      coalesce(nullif(g(4), lit("")), lit("0")).cast("int"),
      coalesce(nullif(g(5), lit("")), lit("0")).cast("int"),
      coalesce(nullif(g(6), lit("")), lit("0")).cast("decimal(16,6)"))
    val calOk = coalesce(lower(col("cf_calendar")), lit("standard"))
      .isin("standard", "gregorian", "proleptic_gregorian")
    // epoch seconds as double (timestamp→double cast is seconds.fraction);
    // microsecond-exact for any realistic coordinate magnitude
    val timeVal = (epochTs.cast("double") + decoded * unitSec).cast("timestamp")

    KerchunkIndex.decodeCoords(chunks, meta, dims)
      .join(broadcast(cf), Seq("variable"), "left")
      // loud refusals, evaluated per row inside the scan stage: a decode
      // that silently shifted every date (non-standard calendar) or left a
      // time axis raw (unparseable unit/epoch) would be worse than failing
      .filter(coalesce(assert_true(!timeLike || calOk,
        concat(lit("CF variable '"), col("variable"), lit("' has calendar '"),
          col("cf_calendar"),
          lit("' — only standard/gregorian/proleptic_gregorian decode to timestamps"))),
        lit(true)))
      .filter(coalesce(assert_true(!timeLike || (unitSec.isNotNull && epochOk),
        concat(lit("CF variable '"), col("variable"), lit("' time units '"),
          col("cf_units"), lit("' did not parse as '<unit> since <datetime>'"))),
        lit(true)))
      .select(col("variable"), col("chunk"), col("idx"),
        decoded.as("value"),
        when(timeLike && decoded.isNotNull, timeVal).otherwise(lit(null).cast("timestamp"))
          .as("time"),
        col("dims"), col("coords"))
  }
}
