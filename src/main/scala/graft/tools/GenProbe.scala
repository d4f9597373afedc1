package graft.tools

/** Single-threaded microbench of the page generator + text extractor —
 *  interference-tolerant A/B harness for kernel changes (alternating
 *  rounds, best-of). `runMain graft.tools.GenProbe [nPages] [rounds]`. */
object GenProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("hash")) {
      // order-sensitive content hash of the synthetic corpus — byte-identity
      // check across generator refactors (the per-url invariant)
      var h = 1125899906842597L
      for (seed <- Seq(42L, 7L); i <- 0L until 200000L) {
        val b = graft.pages.PagesKernel.html(i, seed)
        var k = 0
        while (k < b.length) { h = h * 31 + b(k); k += 1 }
      }
      println(s"HTMLHASH $h")
      return
    }
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    var sink = 0L
    def genRound(): Double = {
      val t0 = System.nanoTime()
      var i = 0L
      while (i < n) { sink += graft.pages.PagesKernel.html(i, 42).length; i += 1 }
      n / ((System.nanoTime() - t0) / 1e9)
    }
    def extractRound(): Double = {
      val htmls = Array.tabulate(4096)(i => graft.pages.PagesKernel.html(i.toLong, 42))
      val reps = (n / 4096).toInt
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) {
        var i = 0
        while (i < 4096) { sink += graft.text.TextKernel.extractText(htmls(i)).numBytes; i += 1 }
        r += 1
      }
      (reps.toLong * 4096) / ((System.nanoTime() - t0) / 1e9)
    }
    def entityRound(): Double = {
      val texts = Array.tabulate(4096)(i =>
        graft.text.TextKernel.extractText(graft.pages.PagesKernel.html(i.toLong, 42)))
      val reps = (n / 4096).toInt
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) {
        var i = 0
        while (i < 4096) {
          val e = graft.pages.PagesKernel.extractEntity(texts(i))
          if (e != null) sink += e.numBytes
          i += 1
        }
        r += 1
      }
      (reps.toLong * 4096) / ((System.nanoTime() - t0) / 1e9)
    }
    val gen = (0 until rounds).map(_ => genRound())
    val ext = (0 until rounds).map(_ => extractRound())
    val ent = (0 until rounds).map(_ => entityRound())
    println(f"GEN best ${gen.max}%.0f pages/s  all ${gen.map(v => f"$v%.0f").mkString(",")}")
    println(f"EXT best ${ext.max}%.0f pages/s  all ${ext.map(v => f"$v%.0f").mkString(",")}")
    println(f"ENT best ${ent.max}%.0f pages/s  all ${ent.map(v => f"$v%.0f").mkString(",")}")
    println(s"sink $sink")
  }
}
