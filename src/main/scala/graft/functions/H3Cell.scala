package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** H3 cell-index algebra (reference F6 context, loaders.py:10-16) as
  * pure column bit-math — no UDF, fully codegen'd, exact per the
  * public H3 index layout (mode-1 cell index, 64-bit):
  *
  *   bit  63     reserved (0)
  *   bits 62-59  index mode (1 = cell)
  *   bits 58-56  reserved (0)
  *   bits 55-52  resolution (0..15)
  *   bits 51-45  base cell (0..121)
  *   bits 44-0   15 resolution digits, 3 bits each (digit r at bits
  *               [(15−r)·3, (15−r)·3+2]; unused digits = 7)
  *
  * These operations — validity, resolution, base cell, PARENT
  * truncation — are exact integer algebra independent of any
  * geographic constant, and parent truncation is THE geo operation a
  * 100 TB pipeline needs (bucket/rollup/join billions of points by
  * coarser cell without decoding a single coordinate).
  *
  * The cell→centroid decode stays a pluggable seam
  * (Inventory.H3Decoder): the inverse gnomonic projection requires
  * the canonical icosahedron tables (20 face centers, 122 base-cell
  * orientations), which are unavailable in this offline image and are
  * not reproducible from first principles; a silently wrong
  * "real-looking" decode would be strictly worse than the documented
  * deterministic stub (SURVEY §7.4(1)).
  */
object H3Cell {

  /** Hex cell-index string → 64-bit long (null/garbage → null). */
  def parse(h3: Column): Column = {
    val t = trim(h3)
    when(t.rlike("^[0-9a-fA-F]{1,16}$"), conv(t, 16, 10).cast("long"))
  }

  /** Resolution (bits 55-52). */
  def resolution(cell: Column): Column =
    shiftrightunsigned(cell, 52).bitwiseAND(lit(0xFL))

  /** Base cell number (bits 51-45; 0..121). */
  def baseCell(cell: Column): Column =
    shiftrightunsigned(cell, 45).bitwiseAND(lit(0x7FL))

  /** Digit for resolution r (1..15): 3 bits at (15−r)·3. */
  def digit(cell: Column, r: Int): Column =
    shiftrightunsigned(cell, (15 - r) * 3).bitwiseAND(lit(0x7L))

  /** The 12 pentagon base cells (public H3 base-cell table). */
  val PentagonBaseCells: Seq[Long] =
    Seq(4L, 14L, 24L, 38L, 49L, 58L, 63L, 72L, 83L, 97L, 107L, 117L)

  /** Structural validity of a mode-1 cell index: reserved bits clear,
    * mode 1, base cell < 122, every digit ≤ resolution non-7, every
    * digit beyond it exactly 7, and — under a pentagon base cell —
    * a leading (first non-zero) digit that is not the deleted K axis
    * (digit 1), per the public H3 validity rules.
    */
  def isValid(cell: Column): Column = {
    val mode = shiftrightunsigned(cell, 59).bitwiseAND(lit(0xFL))
    val reservedHi = shiftrightunsigned(cell, 63)
    val reservedMid = shiftrightunsigned(cell, 56).bitwiseAND(lit(0x7L))
    val res = resolution(cell)
    val digitsOk = (1 to 15).map { r =>
      when(lit(r) <= res, digit(cell, r) < 7)
        .otherwise(digit(cell, r) === 7)
    }.reduce(_ && _)
    // first non-zero digit within the resolution (0 when all-zero)
    val leadingNonZero = (1 to 15).reverse.foldLeft(lit(0L)) {
      (rest, r) =>
        when(lit(r) <= res && digit(cell, r) =!= 0, digit(cell, r))
          .otherwise(rest)
    }
    val pentagonOk = !baseCell(cell).isin(PentagonBaseCells: _*) ||
      leadingNonZero =!= 1
    cell.isNotNull && reservedHi === 0 && mode === 1 &&
      reservedMid === 0 && baseCell(cell) < 122 && digitsOk && pentagonOk
  }

  /** Parent cell at `parentRes`: set the resolution nibble and fill
    * the digits below it with 7 — pure truncation, exact at any scale.
    * Null when parentRes exceeds the cell's own resolution.
    */
  def parent(cell: Column, parentRes: Int): Column = {
    require(parentRes >= 0 && parentRes <= 15, s"bad res $parentRes")
    val resCleared = cell.bitwiseAND(lit(~(0xFL << 52)))
    val withRes = resCleared.bitwiseOR(lit(parentRes.toLong << 52))
    val fillMask = lit((1L << ((15 - parentRes) * 3)) - 1L)
    when(resolution(cell) >= parentRes, withRes.bitwiseOR(fillMask))
  }

  /** Parent as a canonical 15-hex-digit lowercase string (the textual
    * form the inventory carries, loaders.py:31).
    */
  def parentHex(h3: Column, parentRes: Int): Column =
    lower(conv(parent(parse(h3), parentRes), 10, 16))
}
