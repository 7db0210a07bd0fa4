package graft.functions

/** Scala-side reference of the trim2 expression for use in specs. */
object RoundingCheck {
  def trim2Ref(x: Double): Double =
    if (x > 0) {
      val d = 1 - math.floor(math.log10(x))
      val r = math.pow(10.0, d)
      math.floor(x * r + 0.5) / r
    } else 0.0
}
