package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers.
  *
  * The driver's correctness gate hash-compares Spark results against DuckDB
  * running the `oracleSql` on the same parquet (BASELINE.md). Double
  * summation is order-dependent, and Spark's partial-aggregation order is
  * not DuckDB's scan order — so every floating aggregate goes through an
  * exact decimal accumulator and is cast back to double once at the end.
  * The double→decimal cast of each input element is deterministic, the
  * decimal sum is exact (order-independent), and the final decimal→double
  * cast is a single deterministic rounding: bit-identical in both engines
  * regardless of parallelism. This also holds at 1000-executor scale where
  * partial-agg ordering is fully nondeterministic.
  */
object Det {

  /** Exact (order-independent) sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  /** DuckDB rendering of [[dsum]]. */
  def dsumSql(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"

  /** Exact running/windowed sum: caller applies `.over(w)` then `asDouble`. */
  def decSum(c: Column): Column = sum(c.cast(DecimalType(28, 6)))

  /** Deterministic 4-decimal rounding of a nonnegative double.
    *
    * NOT `round(x, 4)`: Spark rounds the shortest decimal rendering of the
    * double (BigDecimal HALF_UP) while DuckDB rounds the binary value, so
    * values landing exactly on a half at the 5th decimal disagree. This
    * formulation is plain IEEE arithmetic — identical bits in, identical
    * bits out, in any engine. */
  def r4(c: Column): Column = floor(c * 10000d + 0.5d) / 10000d

  /** DuckDB rendering of [[r4]]. */
  def r4Sql(x: String): String = s"floor(($x) * 10000 + 0.5) / 10000"

  /** [[r4]] at 9 decimals — for quantities whose magnitude is far below
    * 1 (e.g. PageRank mass over a large node set, ~1/N), where 4 decimals
    * would collapse the whole distribution. Same IEEE-only construction,
    * same cross-engine guarantee; 1e9 is exactly representable. */
  def r9(c: Column): Column = floor(c * 1e9d + 0.5d) / 1e9d

  /** DuckDB rendering of [[r9]]. */
  def r9Sql(x: String): String =
    s"floor(($x) * 1000000000 + 0.5) / 1000000000"
}
