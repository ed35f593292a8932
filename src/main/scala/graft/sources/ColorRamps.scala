package graft.sources

/**
 * Well-known color ramps (F13 completion): the reference ships these as
 * commented-out dead code in utils/Renderer.java:614-838 — jet(alpha),
 * heat, grayscale, redgreen, redblackgreen, rainbow, wave, plus the fixed
 * 20-distinct-color and Excel palettes, selected by name
 * (Renderer.java:585-607). Re-derived here LIVE with the exact arithmetic
 * of the dead code, including its int-truncation behavior (`(int)(x)`
 * drops the fraction) and java.awt.Color's float-constructor rounding
 * (`(int)(v*255 + 0.5)`), so a legend rendered from these tables is
 * pixel-identical to what the reference would produce if revived.
 *
 * Export-side tables (256 RGB triples for the continuous ramps); the
 * distributed path never touches them — rendering is a driver-side export
 * like [[GeodataIO.exportPng]].
 */
object ColorRamps {

  type Rgb = (Int, Int, Int)

  /** java.awt.Color(float,float,float) channel rounding. */
  @inline private def fch(v: Float): Int = (v * 255 + 0.5f).toInt

  /** Piecewise jet (Renderer.java:614-648): 4-segment blue->cyan->yellow->
    * red with FLOAT arithmetic and Color(float) rounding. */
  lazy val jet: IndexedSeq[Rgb] = {
    val n = 256 / 4
    (0 until 256).map { i =>
      var r = 0f; var g = 0f; var b = 0f
      if (i < n / 2.0) { r = 0; g = 0; b = 0.5f + i.toFloat / n }
      else if (i < 3.0 * n / 2.0) { r = 0; g = i.toFloat / n - 0.5f; b = 1f }
      else if (i < 5.0 * n / 2.0) { r = i.toFloat / n - 1.5f; g = 1f; b = 1f - i.toFloat / n + 1.5f }
      else if (i < 7.0 * n / 2.0) { r = 1f; g = 1f - i.toFloat / n + 2.5f; b = 0 }
      else { r = 1f - i.toFloat / n + 3.5f; g = 0; b = 0 }
      (fch(r), fch(g), fch(b))
    }
  }

  /** Heat (Renderer.java:650-675): black->red->yellow->white with n = 3/8
    * of the table; DOUBLE arithmetic, truncating casts. */
  lazy val heat: IndexedSeq[Rgb] = {
    val n = (3.0 / 8.0 * 256).toInt
    (0 until 256).map { i =>
      var r = (1.0 / n) * (i + 1); var g = 0.0; var b = 0.0
      if (i >= n) { r = 1.0; g = (1.0 / n) * (i + 1 - n); b = 0.0 }
      if (i >= 2 * n) { r = 1.0; g = 1.0; b = 1.0 / (256 - 2 * n) * (i + 1 - 2 * n) }
      ((r * 255).toInt, (g * 255).toInt, (b * 255).toInt)
    }
  }

  /** Grayscale (Renderer.java:677-681). */
  lazy val grayscale: IndexedSeq[Rgb] = (0 until 256).map(i => (i, i, i))

  /** Red->white->green diverging (Renderer.java:683-696). The reference's
    * first loop runs i <= half, so index 128 is written by the RED branch
    * (saturating to white) — preserved. */
  lazy val redgreen: IndexedSeq[Rgb] = {
    val half = 256 / 2.0
    (0 until 256).map { i =>
      if (i <= half)
        (255, ((i / half) * 255).toInt, ((i / half) * 255).toInt)
      else
        (255 - (((i - half) / half) * 255).toInt, 255,
         255 - (((i - half) / half) * 255).toInt)
    }
  }

  /** Red->black->green diverging (Renderer.java:698-707). */
  lazy val redblackgreen: IndexedSeq[Rgb] = {
    val half = 256 / 2.0
    (0 until 256).map { i =>
      if (i <= half) (255 - ((i / half) * 255).toInt, 0, 0)
      else (0, (((i - half) / half) * 255).toInt, 0)
    }
  }

  /** Rainbow (Renderer.java:709-721): five hand-fit linear segments with
    * truncating casts. */
  lazy val rainbow: IndexedSeq[Rgb] = (0 until 256).map { i =>
    if (i <= 29) ((129.36 - i * 4.36).toInt, 0, 255)
    else if (i <= 86) (0, (-133.54 + i * 4.52).toInt, 255)
    else if (i <= 141) (0, 255, (665.83 - i * 4.72).toInt)
    else if (i <= 199) ((-635.26 + i * 4.47).toInt, 255, 0)
    else (255, (1166.81 - i * 4.57).toInt, 0)
  }

  /** Wave (Renderer.java:723-734): sinusoidal channels, truncating casts. */
  lazy val wave: IndexedSeq[Rgb] = (0 until 256).map { i =>
    (((math.sin(i.toDouble / 40 - 3.2) + 1) * 128).toInt,
     ((1 - math.sin(i / 2.55 - 3.1)) * 70 + 30).toInt,
     ((1 - math.sin(i.toDouble / 40 - 3.1)) * 128).toInt)
  }

  /** The 20-simple-distinct-colors palette + white/black
    * (Renderer.java:752-778; the reference table actually holds 22
    * entries). */
  val random20: IndexedSeq[Rgb] = IndexedSeq(
    (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
    (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
    (210, 245, 60), (250, 190, 190), (0, 128, 128), (230, 190, 255),
    (170, 110, 40), (255, 250, 200), (128, 0, 0), (170, 255, 195),
    (128, 128, 0), (255, 215, 180), (0, 0, 128), (128, 128, 128),
    (255, 255, 255), (0, 0, 0))

  /** The 54-color Excel palette (Renderer.java:780-836). */
  val excel: IndexedSeq[Rgb] = IndexedSeq(
    (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0), (255, 0, 255),
    (0, 255, 255), (128, 0, 0), (0, 128, 0), (0, 0, 128), (128, 128, 0),
    (128, 0, 128), (0, 128, 128), (192, 192, 192), (128, 128, 128),
    (153, 153, 255), (153, 51, 102), (255, 255, 204), (204, 255, 255),
    (102, 0, 102), (255, 128, 128), (0, 102, 204), (204, 204, 255),
    (0, 0, 128), (255, 0, 255), (255, 255, 0), (0, 255, 255),
    (128, 0, 128), (128, 0, 0), (0, 128, 128), (0, 0, 255),
    (0, 204, 255), (204, 255, 255), (204, 255, 204), (255, 255, 153),
    (153, 204, 255), (255, 153, 204), (204, 153, 255), (255, 204, 153),
    (51, 102, 255), (51, 204, 204), (153, 204, 0), (255, 204, 0),
    (255, 153, 0), (255, 102, 0), (102, 102, 153), (150, 150, 150),
    (0, 51, 102), (51, 153, 102), (0, 51, 0), (51, 51, 0), (153, 51, 0),
    (153, 51, 102), (51, 51, 153), (51, 51, 51))

  /** Name dispatch (Renderer.java:585-607). Unknown names -> None, as the
    * reference's switch falls through to null. Deliberate addition beyond
    * that switch: "grayscale" (the reference builds the table but its
    * switch never dispatches it — ADVICE r5 asked this divergence be
    * documented; exposing the dead table by name is the useful reading). */
  def byName(name: String): Option[IndexedSeq[Rgb]] = name match {
    case "jet"           => Some(jet)
    case "heat"          => Some(heat)
    case "grayscale"     => Some(grayscale)
    case "redgreen"      => Some(redgreen)
    case "redblackgreen" => Some(redblackgreen)
    case "rainbow"       => Some(rainbow)
    case "wave"          => Some(wave)
    case "excel"         => Some(excel)
    case "random"        => Some(random20)
    case _               => None
  }

  /** Ramp lookup for a normalized value in [0,1] over an N-entry table
    * (the createImage legend indexing, Renderer.java:736-750: floor into
    * the table, clamped). Returns an opaque ARGB int. */
  def argb(table: IndexedSeq[Rgb], t: Double): Int = {
    val x = math.max(0.0, math.min(1.0, t))
    val i = math.min(table.length - 1, (x * table.length).toInt)
    val (r, g, b) = table(i)
    (0xff << 24) | (r << 16) | (g << 8) | b
  }
}
