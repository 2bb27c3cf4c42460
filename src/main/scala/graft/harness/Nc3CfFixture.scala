package graft.harness

/** Hand-encoded netCDF classic (CDF-1) fixture with CF-convention
  * attributes, written field by field from the public netCDF classic
  * format spec (the same layout [[graft.sources.NetCDF3Index]] parses).
  * Exercises every piece of the CF decode layer:
  *
  *  - `time(time=4)` int32 [0, 31, 59, 90], units
  *    "days since 1850-01-16 12:00:00", calendar "standard" → timestamps;
  *  - `lat(lat=3)` double [-30, 0, 30], units "degrees_north" → identity;
  *  - `tas(time,lat)` int16 packed with scale_factor=0.01,
  *    add_offset=250.0, _FillValue=-999: raw(t,l) = t*100 + l*10 - 150,
  *    with raw(1,1) = -999 (fill → null);
  *  - `rh(time,lat)` float with missing_value=1e20f:
  *    raw(t,l) = t + l*0.5, with raw(2,0) = 1e20f (missing → null);
  *  - `tnl(tfix=4)` int32 [58, 59, 60, 364], units
  *    "days since 0004-01-01 00:00:00", calendar "noleap" — year 0004 IS
  *    a Gregorian leap year, so day-of-year 59 must land on Mar 1 (not
  *    Feb 29), the decisive noleap-vs-gregorian case;
  *  - `t360(tfix)` int32 [29, 30, 359, 719], units
  *    "days since 0001-01-01", calendar "360_day" — 30-day months, so
  *    day 30 is Feb 1 and day 359 is Dec 30 (the year's last day);
  *  - `pb(lat=3)` BYTE with `_Unsigned="true"`, scale_factor=2.0,
  *    add_offset=1.0, _FillValue=-106: raw [-1, 100, -106] — the stored
  *    -1 must reinterpret to 255 (→ 511.0 unpacked) and the stored -106
  *    must match the equally-reinterpreted fill (150) → null. Without
  *    the reinterpretation -1 unpacks to -1.0: sign-decisive;
  *  - `tjul(tfix)` int32 [58, 59, 60, 1460], units
  *    "Days since 1900-01-01" (capitalized — the units regex must be
  *    case-insensitive end to end), calendar "julian" — 1900 IS a julian
  *    leap year, so day 59 is 1900-02-29 (a date that does not exist in
  *    gregorian) and day 1460 crosses three year boundaries to
  *    1903-12-31.
  *
  * All values are closed-form so both the DuckDB oracle and the
  * independent python validator (scripts/cf_check.py) re-derive them. */
object Nc3CfFixture {

  private final class BE {
    private val buf = new java.io.ByteArrayOutputStream()
    def size: Int = buf.size()
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def i32(v: Int): Unit = { u8(v >>> 24); u8(v >>> 16); u8(v >>> 8); u8(v) }
    def i16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def f32(v: Float): Unit = i32(java.lang.Float.floatToIntBits(v))
    def f64(v: Double): Unit = {
      val l = java.lang.Double.doubleToLongBits(v)
      i32((l >>> 32).toInt); i32(l.toInt)
    }
    def bytes(bs: Array[Byte]): Unit = buf.write(bs)
    def pad4(): Unit = while (size % 4 != 0) u8(0)
    def name(s: String): Unit = {
      val b = s.getBytes("UTF-8"); i32(b.length); bytes(b); pad4()
    }
    def result(): Array[Byte] = buf.toByteArray
  }

  private sealed trait AttVal
  private final case class AStr(s: String) extends AttVal
  private final case class AByte(vs: Seq[Int]) extends AttVal
  private final case class AShort(vs: Seq[Int]) extends AttVal
  private final case class AInt(vs: Seq[Int]) extends AttVal
  private final case class AFloat(vs: Seq[Float]) extends AttVal
  private final case class ADouble(vs: Seq[Double]) extends AttVal

  private def attList(s: BE, atts: Seq[(String, AttVal)]): Unit = {
    if (atts.isEmpty) { s.i32(0); s.i32(0) }
    else {
      s.i32(0x0c); s.i32(atts.length)
      atts.foreach { case (nm, v) =>
        s.name(nm)
        v match {
          case AStr(x) =>
            val b = x.getBytes("ISO-8859-1")
            s.i32(2); s.i32(b.length); s.bytes(b); s.pad4()
          case AByte(vs)   => s.i32(1); s.i32(vs.length); vs.foreach(s.u8); s.pad4()
          case AShort(vs)  => s.i32(3); s.i32(vs.length); vs.foreach(s.i16); s.pad4()
          case AInt(vs)    => s.i32(4); s.i32(vs.length); vs.foreach(s.i32)
          case AFloat(vs)  => s.i32(5); s.i32(vs.length); vs.foreach(s.f32)
          case ADouble(vs) => s.i32(6); s.i32(vs.length); vs.foreach(s.f64)
        }
      }
    }
  }

  /** (name, dimids, ncType, atts, slab-writer). Fixed dims only. */
  private final case class V(name: String, dimids: Seq[Int], ncType: Int,
                             atts: Seq[(String, AttVal)], write: BE => Unit)

  // closed-form raw values (shared with the spec's expected-value pins)
  val timeRaw: Seq[Int] = Seq(0, 31, 59, 90)
  val latRaw: Seq[Double] = Seq(-30.0, 0.0, 30.0)
  def tasRaw(t: Int, l: Int): Int = if (t == 1 && l == 1) -999 else t * 100 + l * 10 - 150
  def rhRaw(t: Int, l: Int): Float = if (t == 2 && l == 0) 1e20f else t + l * 0.5f
  val tnlRaw: Seq[Int] = Seq(58, 59, 60, 364)
  val t360Raw: Seq[Int] = Seq(29, 30, 359, 719)
  val pbRaw: Seq[Int] = Seq(-1, 100, -106)
  val tjulRaw: Seq[Int] = Seq(58, 59, 60, 1460)

  def bytes(): Array[Byte] = {
    val dims = Seq(("time", 4), ("lat", 3), ("tfix", 4))
    def typeSize(t: Int): Int = t match {
      case 1 => 1; case 3 => 2; case 4 => 4; case 5 => 4; case 6 => 8
      case other => throw new IllegalArgumentException(s"fixture nc_type $other")
    }
    val vars = Seq(
      V("time", Seq(0), 4,
        Seq("units" -> AStr("days since 1850-01-16 12:00:00"),
            "calendar" -> AStr("standard")),
        s => timeRaw.foreach(s.i32)),
      V("lat", Seq(1), 6,
        Seq("units" -> AStr("degrees_north")),
        s => latRaw.foreach(s.f64)),
      V("tas", Seq(0, 1), 3,
        Seq("scale_factor" -> ADouble(Seq(0.01)),
            "add_offset" -> ADouble(Seq(250.0)),
            "_FillValue" -> AShort(Seq(-999)),
            "units" -> AStr("K")),
        s => for (t <- 0 until 4; l <- 0 until 3) s.i16(tasRaw(t, l))),
      V("rh", Seq(0, 1), 5,
        Seq("missing_value" -> AFloat(Seq(1e20f)),
            "units" -> AStr("1")),
        s => for (t <- 0 until 4; l <- 0 until 3) s.f32(rhRaw(t, l))),
      V("tnl", Seq(2), 4,
        Seq("units" -> AStr("days since 0004-01-01 00:00:00"),
            "calendar" -> AStr("noleap")),
        s => tnlRaw.foreach(s.i32)),
      V("t360", Seq(2), 4,
        Seq("units" -> AStr("days since 0001-01-01"),
            "calendar" -> AStr("360_day")),
        s => t360Raw.foreach(s.i32)),
      V("pb", Seq(1), 1,
        Seq("_Unsigned" -> AStr("true"),
            "scale_factor" -> ADouble(Seq(2.0)),
            "add_offset" -> ADouble(Seq(1.0)),
            "_FillValue" -> AByte(Seq(-106)),
            "units" -> AStr("percent")),
        s => pbRaw.foreach(s.u8)),
      V("tjul", Seq(2), 4,
        Seq("units" -> AStr("Days since 1900-01-01"),
            "calendar" -> AStr("julian")),
        s => tjulRaw.foreach(s.i32)),
    )
    def slabBytes(v: V): Int =
      v.dimids.map(d => dims(d)._2).product * typeSize(v.ncType)
    def ceil4(n: Int): Int = (n + 3) / 4 * 4

    // two passes: header length is independent of the begin values (int32
    // fixed width), so encode once with zeros, then re-encode with real
    // offsets laid out sequentially after the header
    def header(begins: Seq[Int]): Array[Byte] = {
      val s = new BE
      s.bytes("CDF".getBytes("US-ASCII")); s.u8(1) // CDF-1
      s.i32(0)                                     // numrecs (no record vars)
      s.i32(0x0a); s.i32(dims.length)
      dims.foreach { case (nm, len) => s.name(nm); s.i32(len) }
      attList(s, Seq("Conventions" -> AStr("CF-1.7")))
      s.i32(0x0b); s.i32(vars.length)
      vars.zip(begins).foreach { case (v, begin) =>
        s.name(v.name); s.i32(v.dimids.length); v.dimids.foreach(s.i32)
        attList(s, v.atts)
        s.i32(v.ncType); s.i32(ceil4(slabBytes(v))); s.i32(begin)
      }
      s.result()
    }
    val hlen = header(vars.map(_ => 0)).length
    val begins = vars.scanLeft(hlen) { case (at, v) => at + ceil4(slabBytes(v)) }.init
    val out = new BE
    out.bytes(header(begins))
    vars.foreach { v => v.write(out); out.pad4() }
    out.result()
  }
}
