package graft.multimodal

/** IMA/DVI ADPCM (WAV audioFormat 17) — the first PREDICTIVE codec in
  * the real-decode tier: each 4-bit nibble encodes a step-scaled
  * delta against a running predictor with an adaptive step-size
  * index, so decode is a stateful recurrence rather than G.711's
  * per-sample table map. Everything is integer shift/add with the
  * published step and index tables (IMA ADPCM reference algorithm),
  * so a SQL oracle can replay the recurrence — q107 does exactly
  * that with a recursive CTE over nibble positions, making the
  * corpus statistics a bit-for-bit certificate of the whole
  * predictor/step-index state machine.
  */
object Adpcm {

  /** IMA step-size table (89 entries). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230,
    253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963,
    1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
    3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794,
    32767)

  /** Index-adjustment table (by the low 3 bits of the nibble). */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One predictor step: (pred, index) + nibble → (pred', index').
    * diff = step/8 + bit0·step/4 + bit1·step/2 + bit2·step (the
    * shift-approximated (2·mantissa+1)·step/8), sign from bit 3;
    * predictor clamps to int16, index to [0, 88].
    */
  def step(pred: Int, index: Int, nib: Int): (Int, Int) = {
    val s = StepTable(index)
    var diff = s >> 3
    if ((nib & 1) != 0) diff += s >> 2
    if ((nib & 2) != 0) diff += s >> 1
    if ((nib & 4) != 0) diff += s
    val p0 = if ((nib & 8) != 0) pred - diff else pred + diff
    val p = math.min(32767, math.max(-32768, p0))
    val i = math.min(88, math.max(0, index + IndexTable(nib & 7)))
    (p, i)
  }
}
