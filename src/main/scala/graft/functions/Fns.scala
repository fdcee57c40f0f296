package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-level functions — all built from `org.apache.spark.sql.functions`
  * so every one stays inside whole-stage codegen (no UDFs).
  *
  * Includes the oracle-parity arithmetic discipline (SURVEY.md §8):
  * money math goes through exact decimals and is only converted to
  * double at the very end, so Spark and the DuckDB oracle produce
  * bit-identical values regardless of partitioning / summation order.
  */
object Fns {

  // ---------------------------------------------------------------- decimals

  /** Exact-decimal view of a money column. */
  def dec(c: Column, precision: Int = 18, scale: Int = 2): Column =
    c.cast(DecimalType(precision, scale))

  /** Order-independent sum of a money column: exact decimal sum, then a
    * single deterministic cast to double.
    */
  def decSum(c: Column, precision: Int = 18, scale: Int = 2): Column =
    sum(dec(c, precision, scale)).cast("double")

  /** Order-independent average: exact decimal sum → double, divided by
    * the long count (IEEE division is deterministic).
    */
  def decAvg(c: Column, precision: Int = 18, scale: Int = 2): Column =
    decSum(c, precision, scale) / count(lit(1))

  /** Order-independent sum of an exact-decimal *product* column.
    * Products carry wide scales (e.g. 10); casting a big int128-backed
    * decimal straight to double is double-rounded in some engines
    * (value→double, then ÷10^scale). Rounding the sum to scale 6 first
    * keeps the mantissa < 2^53 so decimal→double is single-rounded —
    * bit-identical across engines. Scale 6 is exact (tie-free) because
    * money inputs have true scale 2, so products carry true scale ≤ 6. Oracle form:
    * `CAST(CAST(SUM(expr) AS DECIMAL(38,6)) AS DOUBLE)`.
    */
  def decSumProd(prod: Column): Column =
    sum(prod).cast(DecimalType(38, 6)).cast("double")

  // -------------------------------------------------------------- time

  /** Nanosecond-long → microsecond-long, by exact integer division
    * (epochs are positive, so DIV floors — matching ns→µs narrowing on
    * read elsewhere). Double division would corrupt ~1e18 ns values
    * (> 2^53), hence the SQL `DIV`.
    */
  def nsToUs(c: Column): Column = call_function("div", c, lit(1000L))

  /** Nanosecond-long → TimestampType (µs precision). */
  def nsToTimestamp(c: Column): Column = timestamp_micros(nsToUs(c))

  // ----------------------------------------------------- reference-derived

  /** Surrogate key: md5 over '-'-joined, null-coalesced string casts.
    * Re-expression of dbt_utils.generate_surrogate_key as used by
    * stg_green_tripdata.sql:13 (md5 of vendorid + pickup_datetime).
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(""))): _*))

  /** Code → description CASE mapping; the shape of
    * macros/get_payment_type_description.sql (int code → label, null
    * for unknown codes).
    */
  def caseMap(code: Column, mapping: Seq[(Int, String)]): Column =
    mapping.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(code === lit(k), lit(v)).otherwise(acc)
    }

  /** Order-priority code ('1-URGENT' → 1 → 'Urgent') — the engine's
    * stand-in for payment_type 1..6 → 'Credit card'.. (see SURVEY §4).
    */
  val priorityDescriptions: Seq[(Int, String)] = Seq(
    1 -> "Urgent", 2 -> "High", 3 -> "Medium", 4 -> "Not specified", 5 -> "Low")

  def priorityCode(priority: Column): Column =
    substring(priority, 1, 1).cast("int")

  def priorityDescription(priority: Column): Column =
    caseMap(priorityCode(priority), priorityDescriptions)

  // ------------------------------------------------------------------ text

  /** Occurrences of a literal substring, via the length/replace identity.
    * Chosen over regexp so the DuckDB oracle can state the exact same
    * arithmetic (portable across engines).
    */
  def substrCount(text: Column, sub: String): Column =
    ((length(text) - length(replace(text, lit(sub), lit("")))) / sub.length).cast("int")

  /** Whitespace word tokens (internal use; counting queries use
    * [[substrCount]] arithmetic for oracle parity).
    */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  // -------------------------------------------------------------- vectors

  /** Double-precision dot product of two float arrays via zip_with +
    * a sequential left-fold (deterministic accumulation order).
    * float×float promoted to double is exact (24+24 mantissa bits < 53).
    */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity over float-array embeddings. */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (sqrt(dotProduct(a, a)) * sqrt(dotProduct(b, b)))

  /** Distinct word n-gram shingles of a token array — built with HOFs
    * (transform over an index sequence), fully codegen, no explode.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
}
