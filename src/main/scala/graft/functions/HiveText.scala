package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** K2-K4 — Hive-text / CSV value encoding as Column expressions.
  *
  * Reference semantics (`handler/csv_handler.py:110-136`, `const.py:9-13`,
  * `utils/escape.py:9-25`, `utils/json.py:12-14`):
  *   - NULL → `\N`
  *   - containers (array/map/struct) → JSON, `ensure_ascii=False`;
  *     *falsy* containers (empty array/map) → NULL → `\N` (the
  *     `utils/json.py:13` quirk, preserved deliberately)
  *   - escape table: NUL→`\0`, `\u0001`→`\1`, LF→literal `\n`,
  *     CR→literal `\r`; non-ASCII passes through untouched
  *   - every value stringified; field delimiter `\u0001` (^A); no quoting.
  */
object HiveText {

  val HiveNull = "\\N"
  val FieldDelim = "\u0001"

  /** The reference's escape table applied to a string column. All plain
    * literal replacements — kept as chained native `regexp_replace`
    * (codegen'd); a fused custom Expression is the §7.3 fallback if this
    * chain ever shows up hot in a profile.
    */
  def escape(c: Column): Column = {
    val s1 = regexp_replace(c, "\u0000", "\\\\0")
    val s2 = regexp_replace(s1, "\u0001", "\\\\1")
    val s3 = regexp_replace(s2, "\n", "\\\\n")
    regexp_replace(s3, "\r", "\\\\r")
  }

  /** Encode one value per the reference's rules, given its type. */
  def encodeValue(c: Column, dt: DataType): Column = dt match {
    case _: ArrayType | _: MapType =>
      // falsy-container quirk: empty → NULL token
      when(c.isNull || size(c) === 0, lit(HiveNull)).otherwise(escape(to_json(c)))
    case _: StructType =>
      when(c.isNull, lit(HiveNull)).otherwise(escape(to_json(c)))
    case StringType =>
      when(c.isNull, lit(HiveNull)).otherwise(escape(c))
    case _ =>
      when(c.isNull, lit(HiveNull)).otherwise(c.cast(StringType))
  }

  /** Whole-row Hive-text line: every field encoded, joined on `\u0001`.
    * concat_ws would *drop* nulls, so encodeValue runs first (it never
    * returns NULL).
    */
  def encodeRow(schema: StructType): Column =
    concat_ws(FieldDelim, schema.fields.toSeq.map(f => encodeValue(col(f.name), f.dataType)): _*)
}
