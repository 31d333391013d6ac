package graft

/** Deterministic 18x14 P5 (binary PGM) test images — hash-grade pixel
  * mixes per seed, so two seeds differ in far more than a dHash
  * band's worth of bits while an exact byte copy is Hamming 0. ONE
  * shared generator for the media-screen specs and the screens2
  * probe: the "same generator" claims in their comments must not be
  * able to drift across pasted copies (r14 review find).
  */
object TestImages {
  def p5(seed: Long): Array[Byte] = {
    val w = 18; val h = 14
    val header = s"P5\n$w $h\n255\n".getBytes("UTF-8")
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var j = 0
    while (j < w * h) {
      val x = j % w; val y = j / w
      // multiplicative mix: the seed must shuffle adjacent-pixel
      // ORDERINGS (what dHash compares), not just add a constant
      // that neighbor comparisons cancel out
      out(header.length + j) =
        (((x + y * 18 + seed * 252 + 1) * 2654435761L >>> 16) % 256)
          .toByte
      j += 1
    }
    out
  }
}
