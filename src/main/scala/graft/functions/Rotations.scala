package graft.functions

/** 3-D rotation math mirrored from the reference's plotting utilities
  * (/root/reference/plot3d.py:167-239): quaternion → matrix,
  * Euler → matrix, yaw extraction. Pure driver/kernel math — at the
  * data plane these appear inside typed kernels or generated column
  * expressions, never as a custom Catalyst type.
  */
object Rotations {

  /** Row-major 3×3 rotation matrix from a unit quaternion (w,x,y,z)
    * (plot3d.py:229-239).
    */
  def quatToMatrix(w: Double, x: Double, y: Double, z: Double): Array[Array[Double]] = {
    val n = math.sqrt(w * w + x * x + y * y + z * z)
    val (qw, qx, qy, qz) =
      if (n == 0) (1.0, 0.0, 0.0, 0.0) else (w / n, x / n, y / n, z / n)
    Array(
      Array(1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)),
      Array(2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)),
      Array(2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)))
  }

  /** Rotation matrix from intrinsic Z-Y-X Euler angles in degrees
    * (yaw, pitch, roll) — plot3d.py:215-227.
    */
  def eulerToMatrix(yawDeg: Double, pitchDeg: Double, rollDeg: Double): Array[Array[Double]] = {
    val (cy, sy) = cs(yawDeg); val (cp, sp) = cs(pitchDeg); val (cr, sr) = cs(rollDeg)
    Array(
      Array(cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr),
      Array(sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr),
      Array(-sp, cp * sr, cp * cr))
  }

  /** Heading (yaw) in degrees from a quaternion (plot3d.py:167-172). */
  def yawFromQuat(w: Double, x: Double, y: Double, z: Double): Double =
    math.toDegrees(math.atan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z)))

  /** Orthonormal body frame from a forward direction vector
    * (plot3d.py:203-210): normalize fwd against a world-up Z, derive
    * right = up × fwd, re-derive up = fwd × right — the Gram-Schmidt
    * fallback the reference uses when a channel mapping supplies a
    * direction instead of a quaternion. Rows are (right, up, fwd),
    * matching the reference's `np.vstack` order; the reference's
    * `+ 1e-9` norm guard is preserved so degenerate (zero or
    * Z-parallel) directions produce the same near-zero rows rather
    * than NaN.
    */
  def directionBasis(dx: Double, dy: Double, dz: Double): Array[Array[Double]] = {
    val n = math.sqrt(dx * dx + dy * dy + dz * dz) + 1e-9
    val f = Array(dx / n, dy / n, dz / n)
    val r0 = Array(-f(1), f(0), 0.0) // up(0,0,1) × fwd
    val rn = math.sqrt(r0(0) * r0(0) + r0(1) * r0(1)) + 1e-9
    val r = Array(r0(0) / rn, r0(1) / rn, 0.0)
    val u = Array( // fwd × right
      f(1) * r(2) - f(2) * r(1),
      f(2) * r(0) - f(0) * r(2),
      f(0) * r(1) - f(1) * r(0))
    Array(r, u, f)
  }

  /** Heading in degrees from a rotation matrix's forward row
    * (plot3d.py:125-133): the XY-plane bearing of row 2.
    */
  def headingFromMatrix(m: Array[Array[Double]]): Double =
    math.toDegrees(math.atan2(m(2)(1), m(2)(0)))

  /** Apply a 3×3 matrix to a vector. */
  def rotate(m: Array[Array[Double]], v: (Double, Double, Double)): (Double, Double, Double) = {
    val (x, y, z) = v
    (m(0)(0) * x + m(0)(1) * y + m(0)(2) * z,
      m(1)(0) * x + m(1)(1) * y + m(1)(2) * z,
      m(2)(0) * x + m(2)(1) * y + m(2)(2) * z)
  }

  private def cs(deg: Double): (Double, Double) = {
    val r = math.toRadians(deg)
    (math.cos(r), math.sin(r))
  }
}
