package graft.harness

/** Shared constants of the composed-quality-plane fixtures — used by the
  * `pipeline_quality_filter` gate query, the Bench streaming quality twin,
  * and the StreamingSpec batch-parity test. One definition so the three
  * Scala sites cannot drift apart (a twin measuring a differently-gated
  * filter would silently stop being comparable).
  *
  * The DuckDB oracle SQL for the gate spells the tail LITERALLY (oracle
  * strings must stay self-contained) — change both together.
  */
object QualityFixture {
  /** Planted stopword tail: the synthetic corpus carries no English
    * function words, so Gopher's r_stop_words (and with it the whole
    * conjunction) would be degenerate-false without it. */
  val StopwordTail = " the data and that it holds"

  /** Deterministic synthetic classifier weight numerators (dyadic k/128
    * contract of HashedLinearScore) — a fixed, engine-portable model for
    * fixtures that need a classifier plane without a training pass. */
  def syntheticWeights(dim: Int = 4096): Array[Int] =
    Array.tabulate(dim)(f => (f * 37) % 201 - 100)
}
