package graft

import org.apache.spark.sql.{DataFrame, Row}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Mismatch forensics for the driver's correctness gate: a canonical,
  * engine-portable hash decomposition of each query result, written
  * next to the parquet dump. When an external comparator reports a
  * hash mismatch that doesn't reproduce locally, diffing the two
  * environments' forensics files (or the Spark file vs
  * `tools/forensics.py`'s DuckDB-side mirror) localizes the divergence
  * to a column (per-column md5) and a row set (per-row md5) without
  * needing the raw data from the other environment.
  *
  * Canonical form: columns sorted by name; every cell rendered to a
  * type-tagged string (doubles as raw IEEE-754 bits so formatting can
  * never diverge — NaNs collapse to the canonical quiet NaN;
  * timestamps as epoch micros, dates as epoch days; containers
  * recursively); rows sorted ELEMENTWISE-lexicographically by their
  * rendered tuples (not by concatenated key — concatenation is
  * ambiguous across cell boundaries). Hashes are md5 over UTF-8 bytes
  * with length-prefixed cells (so embedded newlines in text columns
  * can't alias cell boundaries). Per-column md5s hash the column's
  * INDEPENDENTLY sorted values, so a divergence in one column cannot
  * scramble a shared row order and poison every other column's hash.
  */
object Forensics {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
      .map("%02x".format(_)).mkString

  /** UTF-8 byte order == Unicode code-point order, which is also what
    * Python's default str sort uses in the forensics.py mirror. Plain
    * Scala String ordering compares UTF-16 code units, which ranks
    * supplementary-plane characters (surrogate pairs) BELOW U+E000..FFFF
    * and would silently disagree with the mirror on emoji/rare-CJK text.
    */
  private implicit val utf8Ordering: Ordering[String] =
    (a: String, b: String) =>
      java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8))

  private def lenPrefixed(s: String): String =
    s.getBytes(UTF_8).length.toString + ":" + s

  /** Type-tagged canonical rendering; must stay in lock-step with
    * tools/forensics.py (the DuckDB mirror). Container ELEMENTS are
    * length-prefixed too: without it, nested values could alias across
    * element boundaries (["a","b"] vs ["a,s:b"]) and hash a genuine
    * divergence as a clean match.
    */
  def cell(v: Any): String = v match {
    case null => "∅"
    case d: Double => f"d:${java.lang.Double.doubleToLongBits(d)}%016x"
    case f: Float => f"d:${java.lang.Double.doubleToLongBits(f.toDouble)}%016x"
    case b: Boolean => if (b) "true" else "false"
    case s: String => "s:" + s
    case b: Array[Byte] => "b:" + b.map("%02x".format(_)).mkString
    case d: java.sql.Date => "dt:" + d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => "dt:" + d.toEpochDay
    case t: java.sql.Timestamp =>
      // floorDiv, not /: pre-epoch truncation toward zero would add
      // the positive nanos field to the WRONG second
      "ts:" + (Math.floorDiv(t.getTime, 1000L) * 1000000 + t.getNanos / 1000)
    case t: java.time.Instant =>
      "ts:" + (t.getEpochSecond * 1000000 + t.getNano / 1000)
    case d: java.math.BigDecimal => "dec:" + d.stripTrailingZeros.toPlainString
    case d: BigDecimal => "dec:" + d.underlying.stripTrailingZeros.toPlainString
    case seq: scala.collection.Seq[_] =>
      seq.map(e => lenPrefixed(cell(e))).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => lenPrefixed(cell(k)) + "->" + lenPrefixed(cell(x)) }
        .toSeq.sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(e => lenPrefixed(cell(e))).mkString("(", ",", ")")
    case n: Number => n.toString // integral types: Long/Int/Short/Byte
    case other => "?:" + other.toString
  }

  /** Canonical hash decomposition of `df` → JSON string. */
  def report(df: DataFrame): String = {
    import scala.math.Ordering.Implicits.seqOrdering
    val cols = df.columns.sorted.toSeq
    val dtypes = df.dtypes.toMap
    val grid = df.selectExpr(cols.map("`" + _ + "`"): _*).collect()
      .map(r => cols.indices.map(i => cell(r.get(i))).toSeq)
    val sorted = grid.sorted(seqOrdering[Seq, String])
    val colMd5 = cols.indices.map { i =>
      md5hex(sorted.map(r => lenPrefixed(r(i))).sorted.mkString("\n"))
    }
    val rowMd5 = sorted.map(r => md5hex(r.map(lenPrefixed).mkString("\n")))
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val colsJson = cols.zip(colMd5)
      .map { case (c, h) => s"${q(c)}: {${q("dtype")}: ${q(dtypes(c))}, ${q("md5")}: ${q(h)}}" }
      .mkString("{", ", ", "}")
    s"""{"nrows": ${sorted.length}, "total_md5": ${q(md5hex(rowMd5.mkString("\n")))}, "columns": $colsJson, "row_md5": [${rowMd5.map(q).mkString(",")}]}"""
  }
}
