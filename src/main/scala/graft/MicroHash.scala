package graft

import graft.multimodal.Multimodal

/** Throwaway micro-bench for the image decode+hash path (r21): times
  * `averageHash64(payload)` over rendered fixture PNGs and decoded GIF
  * frames, single-threaded and at N threads, so the codec-playbook
  * numbers in OPTIMIZATION_r21.md are reproducible. Not part of the
  * driver contract, not a query.
  *
  * Usage: runMain graft.MicroHash [threads] [reps]
  */
object MicroHash {
  def main(args: Array[String]): Unit = {
    val threads = if (args.length > 0) args(0).toInt else 32
    val reps = if (args.length > 1) args(1).toInt else 2000
    val pngs = (0L until 120L by 3L).map(id =>
      Multimodal.renderPng(id, 8 + (id % 9).toInt, 8 + (id % 7).toInt)).toArray
    // the r20 implementation, verbatim: per-pixel getRGB scan — the
    // A side of the A/B (the B side is the shipped rgbRows path)
    def oldHash(payload: Array[Byte]): java.lang.Long = {
      val img = Multimodal.decodeImage(payload)
      if (img == null) return null
      val w = img.getWidth; val h = img.getHeight
      if (w < 8 || h < 8) return null
      val cellSum = new Array[Long](64)
      val cellCnt = new Array[Long](64)
      var total = 0L
      var y = 0
      while (y < h) {
        val i = y * 8 / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          val c = i * 8 + (x * 8 / w)
          cellSum(c) += lum
          cellCnt(c) += 1
          total += lum
          x += 1
        }
        y += 1
      }
      var bits = 0L
      var c = 0
      val wh = w.toLong * h
      while (c < 64) {
        val lhsHi = Math.multiplyHigh(cellSum(c), wh)
        val lhsLo = cellSum(c) * wh
        val rhsHi = Math.multiplyHigh(total, cellCnt(c))
        val rhsLo = total * cellCnt(c)
        val gt =
          if (lhsHi != rhsHi) lhsHi > rhsHi
          else java.lang.Long.compareUnsigned(lhsLo, rhsLo) > 0
        if (gt) bits |= (1L << c)
        c += 1
      }
      java.lang.Long.valueOf(bits)
    }
    val useOld = sys.env.get("MICROHASH_OLD").contains("1")
    def oneRep(): Long = {
      var acc = 0L
      var i = 0
      while (i < pngs.length) {
        val h = if (useOld) oldHash(pngs(i)) else Multimodal.averageHash64(pngs(i))
        if (h != null) acc ^= h.longValue()
        i += 1
      }
      acc
    }
    // warmup
    (1 to 200).foreach(_ => oneRep())
    def timed(nThreads: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (1 to nThreads).map { _ =>
        new Thread(() => (1 to reps / nThreads).foreach(_ => oneRep()))
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      // µs per decode+hash (reps/nThreads rounds down; report per op)
      sec * 1e6 / ((reps / nThreads) * nThreads * pngs.length)
    }
    println(f"[microhash] 1 thread : ${timed(1)}%8.2f us/op (decode+ahash, ${pngs.length} pngs/rep)")
    println(f"[microhash] $threads%2d threads: ${timed(threads)}%8.2f us/op")
  }
}
