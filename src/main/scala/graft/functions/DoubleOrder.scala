package graft.functions

/** Spark SQLOrderingUtil double compare, shared by the native kernels
  * that must replay Spark's ordering bit-for-bit: ±0.0 compare EQUAL
  * (unlike java.lang.Double.compare), NaN is GREATEST.
  */
private[functions] object DoubleOrder {
  @inline def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)
}
