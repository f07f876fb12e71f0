package graft

/** Throwaway profiling main (not part of the library surface). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    import graft.ops.Multimodal
    // the m_gif_frames per-row workload: nF 4x4 gray frames
    val ids = (0L until 20000L).toArray
    def frames(id: Long): Seq[Array[Byte]] = {
      val nF = (id % 3 + 2).toInt
      (0 until nF).map { f =>
        Array.tabulate(16)(i => ((id + f * 31 + i * 7) % 256).toByte)
      }
    }
    def timeIt(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"PROBE $name%-28s min=${ts.map(_._1).min}%.3f " +
        f"runs=${ts.map(t => f"${t._1}%.3f").mkString(",")} sum=${ts.head._2}")
    }
    val packed = ids.map(id => Multimodal.packGifFrames(frames(id), 4, 4))
    timeIt("packGifFrames (native)") {
      var s = 0L; ids.foreach { id => s += Multimodal.packGifFrames(frames(id), 4, 4).length }; s
    }
    timeIt("packGifFramesImageIO") {
      var s = 0L; ids.foreach { id => s += Multimodal.packGifFramesImageIO(frames(id), 4, 4).length }; s
    }
    timeIt("unpackGif (native)") {
      var s = 0L
      ids.indices.foreach { i => Multimodal.unpackGif(ids(i), packed(i)).foreach(fr => s += fr.pixels.length) }
      s
    }
    timeIt("unpackGifImageIO") {
      var s = 0L
      ids.indices.foreach { i => Multimodal.unpackGifImageIO(ids(i), packed(i)).foreach(fr => s += fr.pixels.length) }
      s
    }
  }
}
