package graft.functions.expressions

/** 128-bit md5 content digest for the large constant arrays that
  * plan-time expressions carry (SRP sign matrices, k-means centroids,
  * PQ codebooks and query LUTs — `nBands·rowsPerBand·dim` / `k·dim`
  * doubles, easily 10k+ elements).
  *
  * Plan transforms and canonicalization compare expressions repeatedly;
  * with a cached digest, `equals` is O(1) per comparison instead of an
  * element-wise walk of the array. Digest equality is TREATED AS
  * content equality: md5 collisions (~2⁻⁶⁴ for adversarial inputs,
  * ~2⁻¹²⁸ random) are below any planning-relevant risk, and the worst
  * case of a collision is two structurally different expressions
  * unifying under common-subexpression elimination — which would
  * require two different trained matrices in one plan colliding.
  */
private[expressions] object ContentDigest {

  def of(a: Array[Double]): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
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
