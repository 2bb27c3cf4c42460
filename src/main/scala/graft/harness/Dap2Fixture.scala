package graft.harness

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.SparkSession

/** Loopback DAP2 server fixture for the `load_opendap` gate query and the
  * Dap2 specs — the stand-in for a real OPeNDAP deployment (the reference's
  * own opendap catalog, noaa-pathfinder-opendap.json, points at public
  * servers this sandbox cannot reach).
  *
  * Serves one dataset, `nation`, derived from the sf dir's nation/region
  * parquet (25 + 5 rows — driver-side collect of fixed-size dimension
  * tables, not data tables):
  *
  *   String  r_name[region = R]             (label vector, count-once XDR)
  *   Int32   n_nationkey[nation = N]
  *   Int16   n_regionkey[nation = N]        (XDR promotes Int16 → 4 bytes)
  *   Byte    flag[nation = N]   = n_nationkey % 3  (packed + padded)
  *   Float32 r_regionkey[region = R]
  *   Float64 key_sum[nation = N][region = R] = n_nationkey + r_regionkey
  *
  * so the DuckDB oracle recomputes every value from the same parquet.
  *
  * The XDR encoder here is written independently from RFC 4506 §4.19 / DAP
  * 2.0 §7.3.2 (two big-endian uint32 counts, 4-byte-promoted integers,
  * packed+padded bytes) — it shares no code with sources.Dap2Index, and
  * Dap2Spec additionally pins both sides against hand-written golden bytes
  * so an encoder/decoder bug pair cannot cancel out.
  *
  * One server per (process, sf dir), started lazily on an ephemeral
  * loopback port with daemon worker threads; it lives for the session
  * (Verify/Bench/test JVMs), like the other harness fixtures.
  */
object Dap2Fixture {

  /** `mapsOf` non-empty renders the var as a DAP Grid whose MAPS section
    * holds the named sibling vars (which then do NOT render at top level —
    * the Grid owns them, like a real server's DDS). String variables carry
    * `sdata` instead of `data` (labels, r11). `container` non-empty nests
    * the declaration inside `Structure { ... } container;` (r12) — the
    * var's `name` stays FULLY QUALIFIED (`obs.depth`), which is both the
    * client's flattened name and the DAP2 projection syntax; consecutive
    * same-container vars render in one Structure block. */
  final case class Var(name: String, dapType: String, dims: Seq[(String, Long)],
                       data: Array[Double], mapsOf: Seq[String] = Nil,
                       sdata: Array[String] = null, container: String = "")

  private val servers = scala.collection.mutable.Map.empty[String, String]

  /** Base dataset url (`http://127.0.0.1:<port>/nation`) for the sf dir's
    * fixture server, starting it on first use. */
  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    servers.getOrElseUpdate(sfDir, start(buildVars(spark, sfDir), "nation", dasText))
  }

  /** Structure-wrapped dataset (r12, `load_opendap_struct`): an atomic
    * member and a Grid inside `Structure { ... } obs;`, values all
    * closed-form (depth = 7i − 3, sst = 10i + 0.25j, maps 2i / 3j) so the
    * DuckDB oracle regenerates them from range() alone. The DAS nests the
    * member attributes inside an `obs` container — the dotted-scope form
    * the client's DAS flattening must resolve. */
  def ensureStruct(spark: SparkSession): String = synchronized {
    servers.getOrElseUpdate("#struct", start(structVars, "station", structDasText))
  }

  /** Sequence dataset (r13, `load_opendap_seq`): one-level
    * `Sequence { Int32 depth; Float64 temp; String station; } cast;` with
    * 6 closed-form records (depth = 7i − 3, temp = 0.25 + 2.5i, station =
    * 'x'×(i%4+1) ++ i — lengths 2..5 exercise every XDR string pad), so
    * the DuckDB oracle regenerates everything from range(). Wire form per
    * DAP 2.0 §7.2.3: 0x5A000000 before each record, members as XDR basic
    * values in declaration order, 0xA5000000 terminator — encoded here
    * independently of the client's walk (Dap2Spec pins golden bytes). */
  def ensureSeq(spark: SparkSession): String = synchronized {
    servers.getOrElseUpdate("#seq", startSeq())
  }

  private[graft] val seqN = 6

  private[graft] def seqDepth(i: Int): Int = 7 * i - 3
  private[graft] def seqTemp(i: Int): Double = 0.25 + 2.5 * i
  private[graft] def seqStation(i: Int): String = "x" * (i % 4 + 1) + i

  /** A background ARRAY rides next to the Sequence: the mixed in-situ
    * dataset shape, so specs prove the array plane and the sequence plane
    * decode from ONE entries frame without cross-fetching. */
  private[graft] val seqBg = Array(5, 9)

  private[graft] def seqDdsText: String =
    s"""Dataset {
      |    Int32 bg[d = ${seqBg.length}];
      |    Sequence {
      |        Int32 depth;
      |        Float64 temp;
      |        String station;
      |    } cast;
      |} casts;""".stripMargin

  private[graft] val seqMembers: Seq[(String, String)] =
    Seq("depth" -> "Int32", "temp" -> "Float64", "station" -> "String")

  /** The DDS for a member projection of `cast` (declaration order — how a
    * real server answers regardless of constraint order). */
  private[graft] def seqCastProjDds(members: Seq[(String, String)]): String = {
    val decls = members.map { case (m, t) => s"        $t $m;" }.mkString("\n")
    s"Dataset {\n    Sequence {\n$decls\n    } cast;\n} casts;"
  }

  private[graft] def seqDasText: String =
    """Attributes {
      |    NC_GLOBAL {
      |        String title "graft DAP2 sequence fixture";
      |    }
      |    cast {
      |        depth {
      |            String units "m";
      |        }
      |    }
      |}""".stripMargin

  /** Every `.dods` request the sequence servers answered, `path?query` —
    * specs assert pushdown by URL (e.g. that no unfiltered fetch ran).
    * Bounded: Verify/Bench sessions run the gate queries repeatedly for
    * the life of the JVM, so old entries roll off past [[seqLogCap]]. */
  private[graft] val seqRequests =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val seqLogCap = 512

  private def logSeqRequest(path: String, query: String): Unit =
    if (path.endsWith(".dods")) {
      seqRequests.add(path + Option(query).map("?" + _).getOrElse(""))
      while (seqRequests.size > seqLogCap) seqRequests.poll()
    }

  /** Evaluate a DAP2 constraint expression (`<projection>&<sel>&…`) the
    * way a real server does — shared by both sequence servers so their
    * semantics can never diverge. Projection picks declared members
    * (answered in DECLARATION order, the libdap/pydap convention);
    * selections filter record indices over the FULL sequence via
    * `valueOf` (Left = numeric member, Right = string member). Returns
    * (projected members, kept record indices). */
  private def evalSeqCe(q: String, seqName: String,
                        declared: Seq[(String, String)],
                        valueOf: (String, Int) => Either[Double, String],
                        n: Int): (Seq[(String, String)], Seq[Int]) = {
    val ceParts = q.split('&')
    val projPart = ceParts.head.trim
    val sels = ceParts.drop(1).map(_.trim).filter(_.nonEmpty).toSeq
    val members =
      if (projPart.isEmpty || projPart == seqName) declared
      else {
        val wanted = projPart.split(',').map { p =>
          require(p.trim.startsWith(s"$seqName."),
            s"mixed projection '$q' unsupported by the fixture")
          p.trim.stripPrefix(s"$seqName.")
        }.toSet
        val picked = declared.filter { case (m, _) => wanted.contains(m) }
        require(picked.size == wanted.size, s"unknown member in projection '$q'")
        picked
      }
    val selRe = (java.util.regex.Pattern.quote(seqName) +
      """\.([A-Za-z_][A-Za-z0-9_]*)(<=|>=|!=|=~|<|>|=)(.+)""").r
    def unquote(lit: String): String = {
      require(lit.length >= 2 && lit.head == '"' && lit.last == '"',
        s"string literal '$lit' must be double-quoted")
      lit.substring(1, lit.length - 1)
    }
    def cmp(x: Double, op: String, lit: String): Boolean = {
      val y = lit.toDouble
      op match {
        case "<" => x < y; case "<=" => x <= y; case ">" => x > y
        case ">=" => x >= y; case "=" => x == y; case "!=" => x != y
        case other => throw new IllegalArgumentException(
          s"numeric op '$other' unsupported by the fixture")
      }
    }
    val keep = (0 until n).filter { i =>
      sels.forall {
        case selRe(m, op, lit) => valueOf(m, i) match {
          case Left(x) => cmp(x, op, lit)
          case Right(s) => op match {
            case "="  => s == unquote(lit)
            case "!=" => s != unquote(lit)
            case "=~" => s.matches(unquote(lit))
            case other => throw new IllegalArgumentException(
              s"string op '$other' unsupported by the fixture")
          }
        }
        case other => throw new IllegalArgumentException(
          s"fixture cannot evaluate selection '$other'")
      }
    }
    (members, keep)
  }

  /** The `.dods` record stream for a member projection of `cast`,
    * optionally restricted to the record indices a selection kept. */
  private[graft] def seqDodsBytes(members: Seq[(String, String)] = seqMembers,
                                  recs: Seq[Int] = 0 until seqN): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write((seqCastProjDds(members) + "\nData:\n").getBytes("US-ASCII"))
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    recs.foreach { i =>
      u32(0x5A000000L) // start of instance
      members.foreach {
        case ("depth", _) => u32(seqDepth(i).toLong & 0xffffffffL) // Int32: 4-byte BE
        case ("temp", _) =>
          val bits = java.lang.Double.doubleToLongBits(seqTemp(i))
          u32((bits >>> 32) & 0xffffffffL); u32(bits & 0xffffffffL)
        case ("station", _) =>
          val sb = seqStation(i).getBytes("UTF-8") // counted string + pad
          u32(sb.length.toLong)
          out.write(sb)
          var pad = (4 - sb.length % 4) % 4
          while (pad > 0) { out.write(0); pad -= 1 }
        case (other, _) => throw new IllegalArgumentException(s"no such member '$other'")
      }
    }
    u32(0xA5000000L) // end of sequence
    out.toByteArray
  }

  private def startSeq(): String = serve("casts") { (path, query) =>
    logSeqRequest(path, query)
    if (path.endsWith(".dds")) (seqDdsText + "\n").getBytes("US-ASCII")
    else if (path.endsWith(".das")) (seqDasText + "\n").getBytes("US-ASCII")
    else if (path.endsWith(".dods")) {
      val q = if (query == null) "" else query.trim
      if (q == "bg" || q == s"bg[0:${seqBg.length - 1}]") {
        val out = new ByteArrayOutputStream()
        out.write((s"Dataset {\n    Int32 bg[d = ${seqBg.length}];\n} casts;" +
          "\nData:\n").getBytes("US-ASCII"))
        out.write(xdrArray("Int32", seqBg.map(_.toDouble)))
        out.toByteArray
      } else {
        val (members, keep) = evalSeqCe(q, "cast", seqMembers, {
          case ("depth", i)   => Left(seqDepth(i).toDouble)
          case ("temp", i)    => Left(seqTemp(i))
          case ("station", i) => Right(seqStation(i))
          case (other, _) => throw new IllegalArgumentException(
            s"selection on unknown member '$other'")
        }, seqN)
        seqDodsBytes(members, keep)
      }
    } else throw new IllegalArgumentException(s"unknown DAP request $path")
  }

  /** Nested-Sequence dataset (r14, `load_opendap_seq_nested`): the
    * profile-of-casts shape —
    * `Sequence { Int32 station; Sequence { Int32 depth; Float64 o2; }
    * profile; Float64 lat; } prof;` — with the nested member in the
    * MIDDLE of declaration order (pins the resume-outer-members walk)
    * and record 0's inner stream EMPTY (just its terminator). All values
    * closed-form: station = 100 + 7i, lat = 0.5i − 1, inner count =
    * i % 3, depth = 10i + j, o2 = 2.5 + 0.5(i + j). Wire form per
    * DAP 2.0 §7.2.3: a nested Sequence member serializes recursively —
    * its own 0x5A-marked records and 0xA5 terminator inline at the
    * member position. */
  def ensureSeqNested(spark: SparkSession): String = synchronized {
    servers.getOrElseUpdate("#seqnested", startSeqNested())
  }

  private[graft] val nestN = 4
  private[graft] def nestStation(i: Int): Int = 100 + 7 * i
  private[graft] def nestLat(i: Int): Double = 0.5 * i - 1.0
  private[graft] def nestCount(i: Int): Int = i % 3
  private[graft] def nestDepth(i: Int, j: Int): Int = 10 * i + j
  private[graft] def nestO2(i: Int, j: Int): Double = 2.5 + 0.5 * (i + j)

  private[graft] val nestMembers: Seq[(String, String)] =
    Seq("station" -> "Int32", "profile" -> "Sequence", "lat" -> "Float64")
  private[graft] val nestInner: Seq[(String, String)] =
    Seq("depth" -> "Int32", "o2" -> "Float64")

  private[graft] def nestProjDds(members: Seq[(String, String)]): String = {
    val decls = members.map {
      case (m, "Sequence") =>
        "        Sequence {\n" +
          nestInner.map { case (n, t) => s"            $t $n;" }.mkString("\n") +
          s"\n        } $m;"
      case (m, t) => s"        $t $m;"
    }.mkString("\n")
    s"Dataset {\n    Sequence {\n$decls\n    } prof;\n} profiles;"
  }

  private[graft] def nestDasText: String =
    """Attributes {
      |    NC_GLOBAL {
      |        String title "graft DAP2 nested sequence fixture";
      |    }
      |}""".stripMargin

  private[graft] def nestDodsBytes(members: Seq[(String, String)] = nestMembers,
                                   recs: Seq[Int] = 0 until nestN,
                                   innerKeep: (Int, Int) => Boolean = (_, _) => true)
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write((nestProjDds(members) + "\nData:\n").getBytes("US-ASCII"))
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def f64(d: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(d)
      u32((bits >>> 32) & 0xffffffffL); u32(bits & 0xffffffffL)
    }
    recs.foreach { i =>
      u32(0x5A000000L)
      members.foreach {
        case ("station", _) => u32(nestStation(i).toLong & 0xffffffffL)
        case ("lat", _)     => f64(nestLat(i))
        case ("profile", _) =>
          (0 until nestCount(i)).filter(innerKeep(i, _)).foreach { j =>
            u32(0x5A000000L)
            u32(nestDepth(i, j).toLong & 0xffffffffL)
            f64(nestO2(i, j))
          }
          u32(0xA5000000L)
        case (other, _) => throw new IllegalArgumentException(s"no such member '$other'")
      }
    }
    u32(0xA5000000L)
    out.toByteArray
  }

  private def startSeqNested(): String = serve("profiles") { (path, query) =>
    logSeqRequest(path, query)
    if (path.endsWith(".dds")) (nestProjDds(nestMembers) + "\n").getBytes("US-ASCII")
    else if (path.endsWith(".das")) (nestDasText + "\n").getBytes("US-ASCII")
    else if (path.endsWith(".dods")) {
      val q = if (query == null) "" else query.trim
      // INNER-member selections (`prof.profile.depth>20`) filter the
      // inner records per outer record (DAP2's innermost-sequence
      // selection semantics — outer records remain, possibly with an
      // empty inner stream); outer selections ride the shared evaluator
      val parts = q.split('&')
      val (innerSels, outerParts) =
        parts.partition(p => p.trim.startsWith("prof.profile."))
      val innerRe =
        """^prof\.profile\.([A-Za-z_][A-Za-z0-9_]*)(<=|>=|!=|<|>|=)(.+)$""".r
      def icmp(x: Double, op: String, lit: String): Boolean = {
        val y = lit.toDouble
        op match {
          case "<" => x < y; case "<=" => x <= y; case ">" => x > y
          case ">=" => x >= y; case "=" => x == y; case "!=" => x != y
        }
      }
      val innerKeep: (Int, Int) => Boolean = (i, j) =>
        innerSels.forall {
          case innerRe(m, op, lit) => m match {
            case "depth" => icmp(nestDepth(i, j).toDouble, op, lit)
            case "o2"    => icmp(nestO2(i, j), op, lit)
            case other => throw new IllegalArgumentException(
              s"selection on unknown inner member '$other'")
          }
          case other => throw new IllegalArgumentException(
            s"fixture cannot evaluate inner selection '$other'")
        }
      val (members, keep) = evalSeqCe(outerParts.mkString("&"), "prof", nestMembers, {
        case ("station", i) => Left(nestStation(i).toDouble)
        case ("lat", i)     => Left(nestLat(i))
        case (other, _) => throw new IllegalArgumentException(
          s"selection on unknown member '$other'")
      }, nestN)
      nestDodsBytes(members, keep, innerKeep)
    } else throw new IllegalArgumentException(s"unknown DAP request $path")
  }

  /** Deep-nested Sequence dataset (r15, `load_opendap_seq_deep`): THREE
    * sequence levels —
    * `Sequence { Int32 station; Sequence { Int32 depth; Sequence {
    * Float64 val; String tag; } samples; Float64 o2; } profile;
    * Float64 lat; } deep;` — with the nested member MID-DECLARATION at
    * both levels and empty streams at every depth (outer records 0 and 3
    * carry no profiles; profile (2,1) carries no samples). All values
    * closed-form so the DuckDB oracle regenerates all three levels from
    * range(): station = 100 + 7i, lat = 0.5i − 1, c1 = i % 3,
    * depth = 10i + j, o2 = 2.5 + 0.5(i + j), c2 = (i + j) % 3,
    * val = 100i + 10j + k + 0.25, tag = 'g'×((i+j+k)%4+1) ++ "ijk"
    * (lengths 1..4 + digits exercise every XDR pad). */
  def ensureSeqDeep(spark: SparkSession): String = synchronized {
    servers.getOrElseUpdate("#seqdeep", startSeqDeep())
  }

  private[graft] val deepN = 4
  private[graft] def deepStation(i: Int): Int = 100 + 7 * i
  private[graft] def deepLat(i: Int): Double = 0.5 * i - 1.0
  private[graft] def deepC1(i: Int): Int = i % 3
  private[graft] def deepDepth(i: Int, j: Int): Int = 10 * i + j
  private[graft] def deepO2(i: Int, j: Int): Double = 2.5 + 0.5 * (i + j)
  private[graft] def deepC2(i: Int, j: Int): Int = (i + j) % 3
  private[graft] def deepVal(i: Int, j: Int, k: Int): Double =
    100 * i + 10 * j + k + 0.25
  private[graft] def deepTag(i: Int, j: Int, k: Int): String =
    "g" * ((i + j + k) % 4 + 1) + s"$i$j$k"

  private[graft] val deepMembers: Seq[(String, String)] =
    Seq("station" -> "Int32", "profile" -> "Sequence", "lat" -> "Float64")
  private[graft] val deepProfile: Seq[(String, String)] =
    Seq("depth" -> "Int32", "samples" -> "Sequence", "o2" -> "Float64")
  private[graft] val deepSamples: Seq[(String, String)] =
    Seq("val" -> "Float64", "tag" -> "String")

  private[graft] def deepProjDds(members: Seq[(String, String)]): String = {
    val samplesBlock =
      "            Sequence {\n" +
        deepSamples.map { case (n, t) => s"                $t $n;" }.mkString("\n") +
        "\n            } samples;"
    val profileBlock =
      "        Sequence {\n" +
        deepProfile.map {
          case ("samples", _) => samplesBlock
          case (n, t) => s"            $t $n;"
        }.mkString("\n") +
        "\n        } profile;"
    val decls = members.map {
      case ("profile", _) => profileBlock
      case (m, t) => s"        $t $m;"
    }.mkString("\n")
    s"Dataset {\n    Sequence {\n$decls\n    } deep;\n} deepcasts;"
  }

  private[graft] def deepDasText: String =
    """Attributes {
      |    NC_GLOBAL {
      |        String title "graft DAP2 deep nested sequence fixture";
      |    }
      |}""".stripMargin

  private[graft] def deepDodsBytes(members: Seq[(String, String)] = deepMembers,
                                   recs: Seq[Int] = 0 until deepN,
                                   keep1: (Int, Int) => Boolean = (_, _) => true,
                                   keep2: (Int, Int, Int) => Boolean = (_, _, _) => true)
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write((deepProjDds(members) + "\nData:\n").getBytes("US-ASCII"))
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def f64(d: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(d)
      u32((bits >>> 32) & 0xffffffffL); u32(bits & 0xffffffffL)
    }
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      u32(b.length.toLong); out.write(b)
      var pad = (4 - b.length % 4) % 4
      while (pad > 0) { out.write(0); pad -= 1 }
    }
    recs.foreach { i =>
      u32(0x5A000000L)
      members.foreach {
        case ("station", _) => u32(deepStation(i).toLong & 0xffffffffL)
        case ("lat", _)     => f64(deepLat(i))
        case ("profile", _) =>
          (0 until deepC1(i)).filter(keep1(i, _)).foreach { j =>
            u32(0x5A000000L)
            u32(deepDepth(i, j).toLong & 0xffffffffL)
            (0 until deepC2(i, j)).filter(keep2(i, j, _)).foreach { k =>
              u32(0x5A000000L); f64(deepVal(i, j, k)); str(deepTag(i, j, k))
            }
            u32(0xA5000000L) // samples terminator
            f64(deepO2(i, j))
          }
          u32(0xA5000000L) // profile terminator
        case (other, _) => throw new IllegalArgumentException(s"no such member '$other'")
      }
    }
    u32(0xA5000000L)
    out.toByteArray
  }

  private def startSeqDeep(): String = serve("deepcasts") { (path, query) =>
    logSeqRequest(path, query)
    if (path.endsWith(".dds")) (deepProjDds(deepMembers) + "\n").getBytes("US-ASCII")
    else if (path.endsWith(".das")) (deepDasText + "\n").getBytes("US-ASCII")
    else if (path.endsWith(".dods")) {
      val q = if (query == null) "" else query.trim
      // selections partition by DOTTED PREFIX DEPTH (deepest first, so
      // 'deep.profile.samples.*' never lands in the profile bucket):
      // each level's predicates filter THAT sequence's records — DAP2's
      // innermost-sequence selection semantics at every depth
      val parts = q.split('&')
      val (lvl3, rest1) =
        parts.partition(p => p.trim.startsWith("deep.profile.samples."))
      val (lvl2, outerParts) =
        rest1.partition(p => p.trim.startsWith("deep.profile."))
      def icmp(x: Double, op: String, lit: String): Boolean = {
        val y = lit.toDouble
        op match {
          case "<" => x < y; case "<=" => x <= y; case ">" => x > y
          case ">=" => x >= y; case "=" => x == y; case "!=" => x != y
        }
      }
      def scmp(s: String, op: String, lit: String): Boolean = {
        require(lit.length >= 2 && lit.head == '"' && lit.last == '"',
          s"string literal '$lit' must be double-quoted")
        val l = lit.substring(1, lit.length - 1)
        op match {
          case "=" => s == l; case "!=" => s != l; case "=~" => s.matches(l)
        }
      }
      val l3Re =
        """^deep\.profile\.samples\.([A-Za-z_][A-Za-z0-9_]*)(<=|>=|!=|=~|<|>|=)(.+)$""".r
      val keep2: (Int, Int, Int) => Boolean = (i, j, k) =>
        lvl3.forall {
          case l3Re(m, op, lit) => m match {
            case "val" => icmp(deepVal(i, j, k), op, lit)
            case "tag" => scmp(deepTag(i, j, k), op, lit)
            case other => throw new IllegalArgumentException(
              s"selection on unknown samples member '$other'")
          }
          case other => throw new IllegalArgumentException(
            s"fixture cannot evaluate samples selection '$other'")
        }
      val l2Re =
        """^deep\.profile\.([A-Za-z_][A-Za-z0-9_]*)(<=|>=|!=|=~|<|>|=)(.+)$""".r
      val keep1: (Int, Int) => Boolean = (i, j) =>
        lvl2.forall {
          case l2Re(m, op, lit) => m match {
            case "depth" => icmp(deepDepth(i, j).toDouble, op, lit)
            case "o2"    => icmp(deepO2(i, j), op, lit)
            case other => throw new IllegalArgumentException(
              s"selection on unknown profile member '$other'")
          }
          case other => throw new IllegalArgumentException(
            s"fixture cannot evaluate profile selection '$other'")
        }
      val (members, keep) = evalSeqCe(outerParts.mkString("&"), "deep", deepMembers, {
        case ("station", i) => Left(deepStation(i).toDouble)
        case ("lat", i)     => Left(deepLat(i))
        case (other, _) => throw new IllegalArgumentException(
          s"selection on unknown member '$other'")
      }, deepN)
      deepDodsBytes(members, keep, keep1, keep2)
    } else throw new IllegalArgumentException(s"unknown DAP request $path")
  }

  /** Structure-wrapped Sequence dataset (r15,
    * `load_opendap_seq_in_struct`): `Structure { Sequence { Int32 d;
    * Float64 v; String w; } cast; } obs;` — the in-situ shape pydap
    * surfaces as `obs.cast`. Structures add NO wire framing, so the
    * `?obs.cast` projection answers the same 0x5A/0xA5 record stream a
    * top-level Sequence would (the constrained DDS keeps the Structure
    * shell — the client must resolve the dotted declaration). Closed
    * forms: d = 3i + 1, v = 1.5i − 2, w = 's'×(i%3+1) ++ i. */
  def ensureSeqInStruct(spark: SparkSession): String = synchronized {
    servers.getOrElseUpdate("#seqinstruct", startSeqInStruct())
  }

  private[graft] val sisN = 5
  private[graft] def sisD(i: Int): Int = 3 * i + 1
  private[graft] def sisV(i: Int): Double = 1.5 * i - 2.0
  private[graft] def sisW(i: Int): String = "s" * (i % 3 + 1) + i

  private[graft] val sisMembers: Seq[(String, String)] =
    Seq("d" -> "Int32", "v" -> "Float64", "w" -> "String")

  private[graft] def sisProjDds(members: Seq[(String, String)]): String = {
    val decls = members.map { case (m, t) => s"            $t $m;" }.mkString("\n")
    "Dataset {\n    Structure {\n        Sequence {\n" + decls +
      "\n        } cast;\n    } obs;\n} structseq;"
  }

  private[graft] def sisDasText: String =
    """Attributes {
      |    NC_GLOBAL {
      |        String title "graft DAP2 sequence-in-structure fixture";
      |    }
      |}""".stripMargin

  private[graft] def sisDodsBytes(members: Seq[(String, String)] = sisMembers,
                                  recs: Seq[Int] = 0 until sisN): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write((sisProjDds(members) + "\nData:\n").getBytes("US-ASCII"))
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    recs.foreach { i =>
      u32(0x5A000000L)
      members.foreach {
        case ("d", _) => u32(sisD(i).toLong & 0xffffffffL)
        case ("v", _) =>
          val bits = java.lang.Double.doubleToLongBits(sisV(i))
          u32((bits >>> 32) & 0xffffffffL); u32(bits & 0xffffffffL)
        case ("w", _) =>
          val sb = sisW(i).getBytes("UTF-8")
          u32(sb.length.toLong); out.write(sb)
          var pad = (4 - sb.length % 4) % 4
          while (pad > 0) { out.write(0); pad -= 1 }
        case (other, _) => throw new IllegalArgumentException(s"no such member '$other'")
      }
    }
    u32(0xA5000000L)
    out.toByteArray
  }

  private def startSeqInStruct(): String = serve("structseq") { (path, query) =>
    logSeqRequest(path, query)
    if (path.endsWith(".dds")) (sisProjDds(sisMembers) + "\n").getBytes("US-ASCII")
    else if (path.endsWith(".das")) (sisDasText + "\n").getBytes("US-ASCII")
    else if (path.endsWith(".dods")) {
      val q = if (query == null) "" else query.trim
      val (members, keep) = evalSeqCe(q, "obs.cast", sisMembers, {
        case ("d", i) => Left(sisD(i).toDouble)
        case ("v", i) => Left(sisV(i))
        case ("w", i) => Right(sisW(i))
        case (other, _) => throw new IllegalArgumentException(
          s"selection on unknown member '$other'")
      }, sisN)
      sisDodsBytes(members, keep)
    } else throw new IllegalArgumentException(s"unknown DAP request $path")
  }

  /** Array-member Sequence dataset (r16, `load_opendap_seq_array`): the
    * in-situ profile shape where each record carries FIXED-GEOMETRY
    * vectors — `Sequence { Int32 station; Float64 tvec[z = 3];
    * Byte flags[f = 5]; String tags[g = 2]; Sequence { Int32 d;
    * Float32 w[k = 2]; } sub; } arr;` — exercising every array wire form
    * inside records (numeric doubled count, Byte packed + padded 5 → 8,
    * String count-once) plus an array inside a NESTED sequence, with
    * record 0's and 3's inner streams EMPTY. Closed forms: station =
    * 100 + 7i, tvec = 10i + z + 0.5, flags = (i + f) % 7, tags =
    * 't'×((i+g)%3+1) ++ i, inner count = i % 3, d = 5i + j, w =
    * 1.5i + 0.25j + k (exact in Float32), so the DuckDB oracle
    * regenerates everything from range() cross joins. Encoded here
    * independently of the client walk (Dap2Spec pins golden bytes). */
  def ensureSeqArray(spark: SparkSession): String = synchronized {
    servers.getOrElseUpdate("#seqarray", startSeqArray())
  }

  private[graft] val arrN = 4
  private[graft] def arrStation(i: Int): Int = 100 + 7 * i
  private[graft] def arrTvec(i: Int, z: Int): Double = 10 * i + z + 0.5
  private[graft] def arrFlags(i: Int, f: Int): Int = (i + f) % 7
  private[graft] def arrTags(i: Int, g: Int): String = "t" * ((i + g) % 3 + 1) + i
  private[graft] def arrSubN(i: Int): Int = i % 3
  private[graft] def arrD(i: Int, j: Int): Int = 5 * i + j
  private[graft] def arrW(i: Int, j: Int, k: Int): Float =
    (1.5 * i + 0.25 * j + k).toFloat

  private[graft] val arrMembers: Seq[(String, String)] = Seq(
    "station" -> "Int32", "tvec" -> "Float64", "flags" -> "Byte",
    "tags" -> "String", "sub" -> "Sequence")

  private[graft] def arrProjDds(members: Seq[(String, String)]): String = {
    val subBlock = "        Sequence {\n            Int32 d;\n" +
      "            Float32 w[k = 2];\n        } sub;"
    val decls = members.map {
      case ("sub", _)     => subBlock
      case ("station", t) => s"        $t station;"
      case ("tvec", t)    => s"        $t tvec[z = 3];"
      case ("flags", t)   => s"        $t flags[f = 5];"
      case ("tags", t)    => s"        $t tags[g = 2];"
      case (other, _) => throw new IllegalArgumentException(s"no such member '$other'")
    }.mkString("\n")
    s"Dataset {\n    Sequence {\n$decls\n    } arr;\n} arrcasts;"
  }

  private[graft] def arrDasText: String =
    """Attributes {
      |    NC_GLOBAL {
      |        String title "graft DAP2 array-member sequence fixture";
      |    }
      |}""".stripMargin

  private[graft] def arrDodsBytes(members: Seq[(String, String)] = arrMembers,
                                  recs: Seq[Int] = 0 until arrN): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write((arrProjDds(members) + "\nData:\n").getBytes("US-ASCII"))
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def f64(d: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(d)
      u32((bits >>> 32) & 0xffffffffL); u32(bits & 0xffffffffL)
    }
    def f32(f: Float): Unit =
      u32(java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL)
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      u32(b.length.toLong); out.write(b)
      var pad = (4 - b.length % 4) % 4
      while (pad > 0) { out.write(0); pad -= 1 }
    }
    recs.foreach { i =>
      u32(0x5A000000L)
      members.foreach {
        case ("station", _) => u32(arrStation(i).toLong & 0xffffffffL)
        case ("tvec", _) => // numeric array: DOUBLED count, then elements
          u32(3L); u32(3L); (0 until 3).foreach(z => f64(arrTvec(i, z)))
        case ("flags", _) => // Byte array: doubled count, packed + padded
          u32(5L); u32(5L); (0 until 5).foreach(f => out.write(arrFlags(i, f)))
          out.write(0); out.write(0); out.write(0)
        case ("tags", _) => // String array: count ONCE, counted strings
          u32(2L); (0 until 2).foreach(g => str(arrTags(i, g)))
        case ("sub", _) =>
          (0 until arrSubN(i)).foreach { j =>
            u32(0x5A000000L); u32(arrD(i, j).toLong & 0xffffffffL)
            u32(2L); u32(2L); (0 until 2).foreach(k => f32(arrW(i, j, k)))
          }
          u32(0xA5000000L)
        case (other, _) => throw new IllegalArgumentException(s"no such member '$other'")
      }
    }
    u32(0xA5000000L)
    out.toByteArray
  }

  private def startSeqArray(): String = serve("arrcasts") { (path, query) =>
    logSeqRequest(path, query)
    if (path.endsWith(".dds")) (arrProjDds(arrMembers) + "\n").getBytes("US-ASCII")
    else if (path.endsWith(".das")) (arrDasText + "\n").getBytes("US-ASCII")
    else if (path.endsWith(".dods")) {
      val q = if (query == null) "" else query.trim
      val (members, keep) = evalSeqCe(q, "arr", arrMembers, {
        case ("station", i) => Left(arrStation(i).toDouble)
        case (other, _) => throw new IllegalArgumentException(
          s"selection on unknown (or non-scalar) member '$other'")
      }, arrN)
      arrDodsBytes(members, keep)
    } else throw new IllegalArgumentException(s"unknown DAP request $path")
  }

  private def structVars: Seq[Var] = Seq(
    Var("obs.depth", "Int32", Seq("d" -> 4L),
      (0 until 4).map(i => (7 * i - 3).toDouble).toArray, container = "obs"),
    Var("obs.sst", "Float64", Seq("d" -> 4L, "r" -> 5L),
      (for (i <- 0 until 4; j <- 0 until 5) yield i * 10 + j * 0.25).toArray,
      mapsOf = Seq("sd", "sr"), container = "obs"),
    Var("sd", "Float64", Seq("d" -> 4L), (0 until 4).map(i => (i * 2).toDouble).toArray),
    Var("sr", "Float64", Seq("r" -> 5L), (0 until 5).map(j => (j * 3).toDouble).toArray),
  )

  private[graft] def structDasText: String =
    """Attributes {
      |    NC_GLOBAL {
      |        String title "graft DAP2 structure fixture";
      |    }
      |    obs {
      |        String platform "buoy";
      |        depth {
      |            String units "m";
      |        }
      |    }
      |}""".stripMargin

  private def buildVars(spark: SparkSession, sfDir: String): Seq[Var] = {
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      .select("n_nationkey", "n_regionkey").orderBy("n_nationkey").collect()
      .map(r => (r.getAs[Number]("n_nationkey").longValue,
                 r.getAs[Number]("n_regionkey").longValue))
    val regionRows = spark.read.parquet(s"$sfDir/region.parquet")
      .select("r_regionkey", "r_name").orderBy("r_regionkey").collect()
    val region = regionRows.map(_.getAs[Number]("r_regionkey").longValue)
    val rNames = regionRows.map(_.getAs[String]("r_name"))
    val n = nation.length.toLong
    val r = region.length.toLong
    Seq(
      // String coordinate-label vector (r11): names re-derivable from the
      // same parquet, so the oracle pins the decoded labels exactly
      Var("r_name", "String", Seq("region" -> r), null, sdata = rNames),
      Var("n_nationkey", "Int32", Seq("nation" -> n), nation.map(_._1.toDouble)),
      Var("n_regionkey", "Int16", Seq("nation" -> n), nation.map(_._2.toDouble)),
      Var("flag", "Byte", Seq("nation" -> n), nation.map(x => (x._1 % 3).toDouble)),
      Var("r_regionkey", "Float32", Seq("region" -> r), region.map(_.toDouble)),
      // key_sum is served as a proper DAP GRID: its coordinate maps are
      // the nation/region key vectors, so the client must both flatten the
      // Grid (array + maps as variables, pydap-style) and carry the maps
      // association through as the CF `coordinates` attribute
      Var("nation", "Float64", Seq("nation" -> n), nation.map(_._1.toDouble)),
      Var("region", "Float64", Seq("region" -> r), region.map(_.toDouble)),
      Var("key_sum", "Float64", Seq("nation" -> n, "region" -> r),
        nation.flatMap(x => region.map(y => (x._1 + y).toDouble)),
        mapsOf = Seq("nation", "region")),
    )
  }

  private[graft] def ddsText(vars: Seq[Var], name: String): String = {
    def leaf(v: Var): String =
      if (v.container.isEmpty) v.name else v.name.stripPrefix(v.container + ".")
    def decl(v: Var, indent: String): String = {
      val dims = v.dims.map { case (d, sz) => s"[$d = $sz]" }.mkString
      s"$indent${v.dapType} ${leaf(v)}$dims;"
    }
    val owned = vars.flatMap(_.mapsOf).toSet
    def render(v: Var, pad: String): String =
      if (v.mapsOf.isEmpty) decl(v, pad)
      else {
        // only maps present in the projected var set render (a constraint
        // on one map projects the Grid away entirely)
        val maps = v.mapsOf.flatMap(m => vars.find(_.name == m))
          .map(m => decl(m, pad + "    ")).mkString("\n")
        s"${pad}Grid {\n$pad ARRAY:\n${decl(v, pad + "    ")}\n$pad MAPS:\n$maps\n$pad} ${leaf(v)};"
      }
    // consecutive same-container vars share one Structure block — DDS text
    // order must equal DODS payload order (the client walks the binary in
    // projected-DDS order), so grouping never reorders
    val visible = vars.filterNot(v => owned.contains(v.name))
    val runs = visible.foldLeft(List.empty[(String, List[Var])]) {
      case ((c, run) :: tail, v) if c == v.container => (c, run :+ v) :: tail
      case (acc, v) => (v.container, List(v)) :: acc
    }.reverse
    val decls = runs.map {
      case ("", run) => run.map(render(_, "    ")).mkString("\n")
      case (c, run) =>
        s"    Structure {\n${run.map(render(_, "        ")).mkString("\n")}\n    } $c;"
    }.mkString("\n")
    s"Dataset {\n$decls\n} $name;"
  }

  private[graft] def dasText: String =
    """Attributes {
      |    NC_GLOBAL {
      |        String title "graft DAP2 fixture over nation/region";
      |    }
      |    n_nationkey {
      |        String units "id";
      |        Float64 scale_factor 2.0;
      |        Float64 add_offset 10.0;
      |    }
      |}""".stripMargin

  /** XDR array body per RFC 4506 §4.19 / DAP 2.0 §7.3.2: count, count,
    * then elements — integers ≤4 bytes promoted to 4-byte big-endian,
    * Byte packed and zero-padded to a 4-byte boundary. */
  private[graft] def xdrArray(dapType: String, values: Array[Double]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    u32(values.length.toLong); u32(values.length.toLong)
    dapType match {
      case "Byte" =>
        values.foreach(v => out.write(v.toInt & 0xff))
        var pad = (4 - values.length % 4) % 4
        while (pad > 0) { out.write(0); pad -= 1 }
      case "Int16" | "UInt16" | "Int32" | "UInt32" =>
        values.foreach(v => u32(v.toLong & 0xffffffffL))
      case "Float32" =>
        values.foreach(v => u32(java.lang.Float.floatToIntBits(v.toFloat).toLong & 0xffffffffL))
      case "Float64" =>
        values.foreach { v =>
          val bits = java.lang.Double.doubleToLongBits(v)
          u32((bits >>> 32) & 0xffffffffL); u32(bits & 0xffffffffL)
        }
      case other => throw new IllegalArgumentException(s"fixture cannot encode $other")
    }
    out.toByteArray
  }

  /** XDR string-array body: element count ONCE (the doubled count is the
    * numeric-array quirk; libdap/pydap serialize string vectors this way),
    * then each string as RFC 4506 §4.11 — length word + UTF-8 bytes,
    * zero-padded to a 4-byte boundary. Independent of the client decoder
    * (Dap2Spec pins both against hand-written golden bytes). */
  private[graft] def xdrStringArray(values: Array[String]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    u32(values.length.toLong)
    values.foreach { s =>
      val b = s.getBytes("UTF-8")
      u32(b.length.toLong)
      out.write(b)
      var pad = (4 - b.length % 4) % 4
      while (pad > 0) { out.write(0); pad -= 1 }
    }
    out.toByteArray
  }

  private val slabRe = """\[(\d+):(\d+)\]""".r

  /** `name[lo:hi][lo:hi]…` → the projected Var with sliced dims + data
    * (C-order). No constraint → the whole variable. A constraint on a
    * GRID array answers the way a real server does: the sliced Grid —
    * array plus its maps, each map sliced on its own dimension — so the
    * client's multi-variable DODS walk is exercised end-to-end. */
  private[graft] def applyConstraint(vars: Seq[Var], query: String): Seq[Var] = {
    if (query == null || query.trim.isEmpty) return vars
    query.split(',').toSeq.flatMap { proj =>
      val name = proj.takeWhile(_ != '[').trim
      val v = vars.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no such variable '$name'"))
      val slabs = slabRe.findAllMatchIn(proj).map(m => (m.group(1).toLong, m.group(2).toLong)).toSeq
      if (slabs.isEmpty) {
        // a bracket-less projection of a Grid still answers the FULL Grid
        // (array + maps), like a real server — returning the bare array
        // would render an empty MAPS section the client's DDS parse rejects
        v +: v.mapsOf.map(mName => vars.find(_.name == mName).getOrElse(
          throw new IllegalArgumentException(s"Grid '$name' references unknown map '$mName'")))
      } else {
        require(slabs.size == v.dims.size,
          s"constraint '$proj' has ${slabs.size} slabs for ${v.dims.size} dims")
        slabs.zip(v.dims).foreach { case ((lo, hi), (d, sz)) =>
          require(lo >= 0 && lo <= hi && hi < sz, s"slab [$lo:$hi] out of range for $d=$sz") }
        val newDims = v.dims.zip(slabs).map { case ((d, _), (lo, hi)) => (d, hi - lo + 1) }
        if (v.sdata != null) {
          // string label vectors are 1-D (coordinate labels)
          require(slabs.size == 1, s"String variable '$name' must be 1-D")
          val (lo, hi) = slabs.head
          Seq(Var(v.name, v.dapType, newDims, null,
            sdata = v.sdata.slice(lo.toInt, hi.toInt + 1)))
        } else {
          // C-order gather of the hyperslab
          val strides = v.dims.map(_._2).scanRight(1L)(_ * _).drop(1)
          def gather(dim: Int, base: Long): Seq[Double] =
            if (dim == slabs.size) Seq(v.data(base.toInt))
            else (slabs(dim)._1 to slabs(dim)._2).flatMap(i => gather(dim + 1, base + i * strides(dim)))
          val sliced = Var(v.name, v.dapType, newDims, gather(0, 0L).toArray, v.mapsOf)
          val slicedMaps = v.mapsOf.zip(slabs).map { case (mName, (lo, hi)) =>
            val m = vars.find(_.name == mName).getOrElse(
              throw new IllegalArgumentException(s"Grid '$name' references unknown map '$mName'"))
            Var(m.name, m.dapType, Seq((m.dims.head._1, hi - lo + 1)),
              m.data.slice(lo.toInt, hi.toInt + 1))
          }
          sliced +: slicedMaps
        }
      }
    }
  }

  /** Shared loopback scaffolding: ephemeral port, daemon worker pool, DAP
    * `Error { ... }` envelope on any handler exception; `respond(path,
    * query)` builds each response body. The dispatcher must start from a
    * short-lived DAEMON thread — HttpServer.start()'s dispatcher inherits
    * the starting thread's daemon flag, and a non-daemon dispatcher pins
    * the JVM open (r7: Verify hung after writing all output). */
  private def serve(dataset: String)(respond: (String, String) => Array[Byte]): String = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8, r => {
      val t = new Thread(r, "dap2-fixture"); t.setDaemon(true); t
    })
    server.setExecutor(pool)
    server.createContext(s"/$dataset", { exchange =>
      try {
        val bytes = respond(exchange.getRequestURI.getPath, exchange.getRequestURI.getQuery)
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
      } catch {
        case e: Exception =>
          val msg = ("Error { " + e.getMessage + " }").getBytes("US-ASCII")
          exchange.sendResponseHeaders(400, msg.length.toLong)
          exchange.getResponseBody.write(msg)
      } finally exchange.close()
    })
    val t = new Thread(() => server.start(), "dap2-fixture-start")
    t.setDaemon(true); t.start(); t.join()
    s"http://127.0.0.1:${server.getAddress.getPort}/$dataset"
  }

  private def start(vars: Seq[Var], dataset: String, das: String): String =
    serve(dataset) { (path, query) =>
      if (path.endsWith(".dds"))
        (ddsText(applyConstraint(vars, query), dataset) + "\n").getBytes("US-ASCII")
      else if (path.endsWith(".das"))
        (das + "\n").getBytes("US-ASCII")
      else if (path.endsWith(".dods")) {
        val projected = applyConstraint(vars, query)
        val out = new ByteArrayOutputStream()
        out.write((ddsText(projected, dataset) + "\nData:\n").getBytes("US-ASCII"))
        projected.foreach(v => out.write(
          if (v.sdata != null) xdrStringArray(v.sdata) else xdrArray(v.dapType, v.data)))
        out.toByteArray
      } else throw new IllegalArgumentException(s"unknown DAP request $path")
    }
}
