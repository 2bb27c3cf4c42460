package graft.harness

/** Fixture math for the ANN drift-gauge gates (r18): vectors exactly
  * orthogonal (to float precision) to EVERY coarse centroid of a frozen
  * model. Appending them is the worst-case model drift — each vector's
  * cosine to its best centroid is ~0, so `annIndexDrift` must read a
  * mean centroid distance of exactly ~1.0 for that batch at ANY baseline,
  * which is what makes the gate's margins scale-independent. */
object DriftFixture {

  /** `n` orthonormal vectors orthogonal to the span of `cents`, by
    * classical Gram-Schmidt over the standard basis with
    * reorthogonalization (projecting against a raw non-orthogonal set
    * sequentially does NOT orthogonalize — measured |cos| 0.16 vs 1e-8).
    * Requires the centroid span to leave at least `n` free dimensions. */
  def modelOrthogonal(cents: Array[Array[Float]], n: Int): Array[Array[Float]] = {
    val dim = cents(0).length
    val basis = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    def projOut(v: Array[Double]): Array[Double] = {
      var r = v.clone()
      basis.foreach { b =>
        val d = r.zip(b).map { case (x, y) => x * y }.sum
        r = r.zip(b).map { case (x, y) => x - d * y }
      }
      r
    }
    def addToBasis(v: Array[Double]): Boolean = {
      val r = projOut(projOut(v)) // twice: GS reorthogonalization
      val norm = math.sqrt(r.map(x => x * x).sum)
      if (norm > 1e-8) { basis += r.map(_ / norm); true } else false
    }
    cents.foreach(c => addToBasis(c.map(_.toDouble)))
    val orth = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    var i = 0
    while (orth.size < n && i < dim) {
      if (addToBasis(Array.tabulate(dim)(j => if (j == i) 1.0 else 0.0)))
        orth += basis.last.map(_.toFloat)
      i += 1
    }
    require(orth.size == n,
      s"DriftFixture: centroid span leaves only ${orth.size} of $n requested " +
        s"free dimensions in dim $dim")
    orth.toArray
  }
}
