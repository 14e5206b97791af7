package graft.functions

/** Driver-side md5 primitive shared by every engine-portable constant
  * family (RHP hyperplanes, MinHash affine seeds, …): md5 is the one hash
  * both Spark and DuckDB expose, so constants derived from it can be
  * rebuilt bit-for-bit by an external oracle. Keeping the derivation in
  * ONE place stops the families from silently drifting apart. */
object PortableHash {
  /** First 32 bits of md5(s) as an unsigned value in a Long — equals
    * DuckDB's `CAST('0x' || substr(md5(s), 1, 8) AS UBIGINT)` and Spark
    * SQL's `conv(substring(md5(s), 1, 8), 16, 10)`. */
  def md5u32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
