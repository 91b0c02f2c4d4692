package graft.maintenance

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) codes for multi-dimensional store clustering.
  *
  * The reference serves its three access paths with three covering
  * indexes over the same rows (reference sql:34-36: database_name +
  * backup_finish_date, + backup_type, + last_lsn). A columnar store gets
  * one physical order, so a single-dimension sort (Compaction.compact's
  * `(database_name, last_lsn)`) serves the per-database paths and
  * abandons the time axis: a fleet-wide `backup_finish_date` range scan
  * (retention cutoffs, point-in-time planning) reads every file. The
  * Z-order curve interleaves the bits of both dimension bins so rows
  * close in EITHER dimension land close in the curve — parquet file/row-
  * group min-max stats then prune on both columns at once. This is the
  * standard lakehouse answer (Delta OPTIMIZE ZORDER BY, Iceberg
  * sort-order z()) to "covering indexes" at 100 TB.
  *
  * Everything here is plain codegen'd integer arithmetic on Columns —
  * no UDFs — and each step is replicated verbatim by the DuckDB oracle
  * (q82), so the codes are value-checked cross-engine bit for bit.
  */
object ZOrder {

  /** Bits per dimension; two dims interleave into a 32-bit code. */
  val DimBits = 16
  val MaxBin: Long = (1L << DimBits) - 1

  /** Spread the low 16 bits of `v` to the even bit positions 0,2,..,30
    * (the classic magic-mask doubling: 8-4-2-1 shifts).
    */
  def spreadBits(v: Column): Column = {
    val b16 = v.bitwiseAND(lit(MaxBin))
    val s8 = b16.bitwiseOR(shiftleft(b16, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s4 = s8.bitwiseOR(shiftleft(s8, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = s4.bitwiseOR(shiftleft(s4, 2)).bitwiseAND(lit(0x33333333L))
    s2.bitwiseOR(shiftleft(s2, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Interleave two 16-bit bins: bin A on even bits, bin B on odd. */
  def mortonCode(binA: Column, binB: Column): Column =
    spreadBits(binA).bitwiseOR(shiftleft(spreadBits(binB), 1))

  /** Equality-dimension bin: 16 bits of md5 (the repo's cross-engine
    * hash — DuckDB replays `('0x' || substr(md5(x), 1, 4))::BIGINT`).
    * Hashing keeps equal values in one bin, which is all an
    * equality-predicate dimension needs from the curve.
    */
  def hashBin16(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long")

  /** Right-shift that maps [minV, maxV] into 16 bits: shed the low bits
    * until the span fits. Pure integer arithmetic (a 64-bit product or a
    * division here would need exactness doubles can't give), order-
    * preserving, and the oracle replays it from the same min/max CTE.
    */
  def rangeShift(minV: Long, maxV: Long): Int = {
    val span = math.max(1L, maxV - minV)
    val bitsNeeded = 64 - java.lang.Long.numberOfLeadingZeros(span)
    math.max(0, bitsNeeded - DimBits)
  }

  /** Range-dimension bin: `(v - minV) >> rangeShift` — at most 2x coarser
    * than exact 16-bit scaling, exact in integers, order-preserving so
    * range predicates prune.
    */
  def rangeBin16(v: Column, minV: Long, maxV: Long): Column =
    shiftright(v - lit(minV), rangeShift(minV, maxV))
}
