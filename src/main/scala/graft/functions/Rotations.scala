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
