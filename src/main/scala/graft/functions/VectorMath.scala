package graft.functions

/** Driver-side constants for vector similarity search.
  *
  * Random-hyperplane LSH planes are derived deterministically from
  * MD5 ("pl{p}_{i}" → first 32 bits → uniform in [-1, 1] at 1e-3
  * resolution) and embedded as *decimal literals* into both the Spark
  * expression and the DuckDB oracle SQL, so the two engines parse the
  * exact same doubles and every downstream float op is bit-identical.
  */
object VectorMath {

  val NumPlanes = 8
  val Dim = 64

  /** planes(p)(i) ∈ {-1.000 … 1.000}, p ∈ [0,8), i ∈ [0,64). */
  val planes: Seq[Seq[BigDecimal]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NumPlanes).map { p =>
      (1 to Dim).map { i =>
        val d = md.digest(s"pl${p}_$i".getBytes("UTF-8"))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        BigDecimal(h % 2001L - 1000L) / 1000
      }
    }
  }

  private def lit(x: BigDecimal): String = x.bigDecimal.toPlainString

  /** Spark SQL literal `array(array(…), …)` of the planes. */
  val planesSparkLit: String =
    planes.map(_.map(lit).mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")

  /** DuckDB literal `[[…], …]` of the planes. */
  val planesDuckLit: String =
    planes.map(_.map(lit).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
}
