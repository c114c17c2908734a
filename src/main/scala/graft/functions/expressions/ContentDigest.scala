package graft.functions.expressions

/** 128-bit content digest (SHA-256 truncated) for the large constant
  * arrays that plan-time expressions carry (SRP sign matrices, k-means
  * centroids, PQ codebooks and query LUTs — `nBands·rowsPerBand·dim` /
  * `k·dim` doubles, easily 10k+ elements).
  *
  * Plan transforms and canonicalization compare expressions repeatedly;
  * with a cached digest, `equals` is O(1) per comparison instead of an
  * element-wise walk of the array. Digest equality is TREATED AS
  * content equality, so the hash must be collision-RESISTANT, not just
  * uniform: md5's collision resistance is broken (~2³⁹ chosen-prefix
  * work), so crafted distinct arrays could have unified under
  * common-subexpression elimination. SHA-256 truncated to 128 bits
  * keeps the comparison O(1) with a ~2⁶⁴ birthday bound against
  * adversarial inputs; the one-time digest cost is the same order as
  * md5's.
  */
private[expressions] object ContentDigest {

  def of(a: Array[Double]): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val buf = java.nio.ByteBuffer.allocate(8192)
    var i = 0
    while (i < a.length) {
      if (buf.remaining() < 8) { buf.flip(); md.update(buf); buf.clear() }
      buf.putLong(java.lang.Double.doubleToLongBits(a(i)))
      i += 1
    }
    buf.flip()
    md.update(buf)
    val bb = java.nio.ByteBuffer.wrap(md.digest())
    (bb.getLong, bb.getLong)
  }
}
