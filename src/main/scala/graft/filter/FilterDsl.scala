package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiler for the reference's metadata filter DSL → a Catalyst [[Column]].
  *
  * Grammar (reference `pkg/core/core.go:1695-1924`): atoms `key op value`
  * with ops `=`, `!=`, `<`, `<=`, `>`, `>=`, combined by case-insensitive
  * `AND` / `OR`. No parentheses — the expression is an OR of AND-blocks
  * (`filterOrRegex`/`filterAndRegex`, `core.go:42-48`). Values may be quoted
  * with `'` or `"`.
  *
  * Semantics replicated exactly:
  *   - Operator detection scans `!=, <=, >=, =, <, >` in that order and takes
  *     the first operator present anywhere in the atom (`core.go:1790-1799`).
  *   - `=` tries numeric interpretation first (B-tree in the reference), then
  *     string/bool bitmap, and array fields match per-element
  *     (array-contains, `core.go:1494-1510`).
  *   - Range ops require a numeric value (error otherwise) and only match
  *     rows where the field exists and is numeric (`core.go:1838-1877`).
  *   - `!=` is `allValid ANDNOT matched` — rows where the field is MISSING
  *     also match (`core.go:1879-1917`).
  *
  * Instead of roaring bitmaps we emit a boolean Column; Catalyst's predicate
  * pushdown + parquet min/max pruning replace the B-tree/bitmap indexes.
  * Unlike the reference (which evaluates each atom against secondary
  * indexes), the compiled Column is pushed into the scan — at 100 TB this is
  * the difference between reading row groups and reading everything.
  */
object FilterDsl {

  private val OrSplit  = """(?i)\s+OR\s+""".r
  private val AndSplit = """(?i)\s+AND\s+""".r
  // Reference `pkg/engine/search_utils.go:18`: (?si)CONTAINS(field,'text')
  private val ContainsRe =
    """(?si)\s*CONTAINS\s*\(\s*(\w+)\s*,\s*['"](.+?)['"]\s*\)""".r

  /** A parsed atom `key op value`. */
  final case class Atom(key: String, op: String, value: String)

  final case class ParseException(msg: String) extends RuntimeException(msg)

  /** Splits a hybrid filter into (booleanFilter, textQuery, textField) — the
    * reference's `parseHybridFilter` (`pkg/engine/search_utils.go:21-44`).
    * Only the FIRST CONTAINS is extracted; dangling AND prefixes/suffixes are
    * trimmed the same way.
    */
  def parseHybridFilter(filter: String): (String, String, String) =
    ContainsRe.findFirstMatchIn(filter) match {
      case None => (filter, "", "")
      case Some(m) =>
        val boolFilter = (filter.substring(0, m.start) + filter.substring(m.end))
          .trim.stripPrefix("AND ").stripSuffix(" AND").trim
        (boolFilter, m.group(2), m.group(1))
    }

  /** Parse into OR-of-AND blocks. Empty blocks are dropped (reference skips
    * empty or-blocks and empty sub-filters).
    */
  def parse(filter: String): Seq[Seq[Atom]] = {
    val trimmed = filter.trim
    if (trimmed.isEmpty) throw ParseException("empty filter")
    OrSplit.split(trimmed).toSeq
      .map(_.trim).filter(_.nonEmpty)
      .map { block =>
        AndSplit.split(block).toSeq.map(_.trim).filter(_.nonEmpty).map(parseAtom)
      }
      .filter(_.nonEmpty)
  }

  /** Operator detection ordered exactly as the reference (`core.go:1792`). */
  private val Ops = Seq("!=", "<=", ">=", "=", "<", ">")

  def parseAtom(s: String): Atom = {
    val hit = Ops.iterator.map(op => (op, s.indexOf(op))).find(_._2 >= 0)
    hit match {
      case None => throw ParseException(s"invalid filter format: '$s'")
      case Some((op, i)) =>
        val key = s.substring(0, i).trim
        val raw = s.substring(i + op.length).trim
        val value = stripQuotes(raw)
        if (key.isEmpty) throw ParseException(s"invalid filter format: '$s'")
        Atom(key, op, value)
    }
  }

  /** Go's strings.Trim(s, "'\"") — strips any mix of quote chars from both
    * ends.
    */
  private def stripQuotes(s: String): String =
    s.dropWhile(c => c == '\'' || c == '"')
      .reverse.dropWhile(c => c == '\'' || c == '"').reverse

  private def parseNum(s: String): Option[Double] =
    try Some(java.lang.Double.parseDouble(s.trim)) catch { case _: Exception => None }

  /** Compile a filter string to a boolean Column against `schema`.
    *
    * `schema` stands in for the reference's per-index secondary indexes: a
    * column's Spark type decides which "index class" the key belongs to
    * (numeric → B-tree, string/bool → bitmap, array → multi-valued bitmap).
    * Keys absent from the schema behave like unindexed fields: `=`/ranges
    * match nothing, `!=` matches everything (field missing on all rows).
    */
  def compile(filter: String, schema: StructType): Column = {
    val blocks = parse(filter)
    blocks.map(_.map(atom => compileAtom(atom, schema)).reduce(_ && _)).reduce(_ || _)
  }

  def compileAtom(atom: Atom, schema: StructType): Column = {
    val field = schema.fields.find(_.name == atom.key)
    atom.op match {
      case "=" => eqMatch(atom, field)
      case "!=" =>
        // allValid ANDNOT matched: missing field / null ⇒ match.
        val m = eqMatch(atom, field)
        !coalesce(m, lit(false))
      case op @ ("<" | "<=" | ">" | ">=") =>
        val num = parseNum(atom.value).getOrElse(
          throw ParseException(s"value must be numeric for operator '$op'"))
        field match {
          case Some(f) if isNumeric(f.dataType) =>
            val c = col(atom.key).cast(DoubleType)
            op match {
              case "<"  => c < num
              case "<=" => c <= num
              case ">"  => c > num
              case ">=" => c >= num
            }
          case _ => lit(false) // no B-tree for this key → empty set
        }
    }
  }

  /** Equality per index class; may evaluate to null only via column nulls
    * (callers of `!=` coalesce).
    */
  private def eqMatch(atom: Atom, field: Option[StructField]): Column =
    field match {
      case None => lit(false)
      case Some(f) =>
        f.dataType match {
          case t if isNumeric(t) =>
            parseNum(atom.value) match {
              case Some(n) => col(atom.key).cast(DoubleType) === n
              case None    => lit(false) // string lookup on numeric field → empty
            }
          case BooleanType =>
            atom.value.toLowerCase match {
              case "true"  => col(atom.key) === true
              case "false" => col(atom.key) === false
              case _       => lit(false)
            }
          case StringType =>
            col(atom.key) === atom.value
          case ArrayType(StringType, _) =>
            array_contains(col(atom.key), atom.value)
          case ArrayType(et, _) if isNumeric(et) =>
            parseNum(atom.value) match {
              case Some(n) => array_contains(col(atom.key).cast(ArrayType(DoubleType)), n)
              case None    => lit(false)
            }
          case _ => lit(false) // unsupported types are skipped at index time
        }
    }

  private def isNumeric(t: DataType): Boolean = t match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _: TimestampType | _: DateType => true // time compares numerically
    case _ => false
  }
}
