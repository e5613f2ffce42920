package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Deterministic on-disk fixture estate for the full-fidelity /collect
  * pipeline and the file-shaped sources (S1/S6/S7).
  *
  * The reference fetches everything over the WAN: LANDFIRE rasters +
  * a cached CSV attribute table (landfire_container.py:46-65), MODIS
  * subset JSON (modis_container.py:240-258), OpenWeatherMap JSON
  * (weather_container.py:146-185), USGS 3DEP elevation rasters
  * (topography_container.py:233-296). The engine's contract starts at
  * "bytes arrive": this object stages those payloads as REAL files —
  * float64 TIFFs in production layouts — LZW strips, deflate tiles,
  * legacy uncompressed ([[TiffCodec]]) — newline-delimited JSON,
  * CSV — at a fixed path, so the Spark side exercises genuine
  * binaryFile/csv/json scans and the DuckDB oracle can independently
  * read the SAME files (read_text / read_csv / read_json).
  *
  * Everything is a pure function of the site table below (golden
  * coordinates from the reference README.md:262-266), so staging is
  * idempotent and the oracle can also re-derive raster pixel values
  * from the generating formulas where it cannot decode TIFF.
  */
object Fixtures {

  /** Fixed absolute root shared with the oracle SQL. Lives under the
    * build's target dir: regenerated on demand, never committed. */
  val Root = "/root/repo/target/graft_fixtures"
  val TextDir = s"$Root/text"
  val RasterDir = s"$Root/rasters"
  val AttributeCsv = s"$TextDir/landfire_attributes.csv"
  val RasterIndexCsv = s"$TextDir/rasters_index.csv"
  val ModisJsonl = s"$TextDir/modis_subset.jsonl"
  val WeatherJsonl = s"$TextDir/weather_current.jsonl"
  val IngestJsonl = s"$TextDir/ingest_mixed.jsonl"

  /** Bump when any generated content changes (stale-dir guard). */
  private val Version = "v8"

  /** Mixed-quality JSONL feed for the quarantine-ingest query: 200
    * deterministic lines, every 17th-ish (i % 17 == 3) replaced by one
    * of three SYNTACTICALLY invalid forms (truncated object, bare text,
    * dangling comma) — never blank, so both engines see every line, and
    * never valid-JSON-wrong-shape, so Spark's `_corrupt_record` capture
    * and DuckDB's `json_valid` agree exactly on which lines quarantine. */
  private[graft] def ingestJsonlContent: String = {
    val lines = (0 until 200).map { i =>
      if (i % 17 == 3) (i % 3) match {
        case 0 => s"""{"id":$i,"v":"""
        case 1 => s"not json line $i"
        case _ => s"""{"id":$i,"""
      }
      else {
        val cents = (i * 37) % 10000
        s"""{"id":$i,"v":${cents / 100}.${f"${cents % 100}%02d"},"tag":"t${i % 5}"}"""
      }
    }
    lines.mkString("", "\n", "\n")
  }

  /** One golden coordinate (README.md:262-266) + its fixture parameters:
    * center-pixel product codes and the elevation field's base/amplitude
    * (which pin the terrain class: amp 40 → LOW, 90 → MODERATE,
    * 120/160 → HIGH per topography_container.py:265-274). `offGrid`
    * sites get rasters whose transform misses the coordinate — the
    * "Coordinates outside raster bounds" path
    * (landfire_container.py:113); they also have no MODIS subset rows,
    * exercising the missing-container path (orchestrator.py:735-741). */
  final case class Site(
      idx: Int, id: String, name: String,
      lat: Double, lon: Double, bufferM: Int, eventId: Option[String],
      vegCode: Int, fuelCode: Int, elevBase: Int, elevAmp: Int,
      offGrid: Boolean = false)

  val sites: Seq[Site] = Seq(
    Site(0, "req_la", "Los Angeles", 34.0522, -118.2437, 1000, Some("fire_2024-001"), 7299, 93, 50, 40),
    Site(1, "req_yellowstone", "Yellowstone", 44.6, -110.5, 5000, None, 3215, 122, 2200, 160),
    Site(2, "req_death_valley", "Death Valley", 36.5, -117.0, 1000, Some("dv_survey_01"), 2092, 145, -80, 90),
    Site(3, "req_seattle", "Seattle", 47.5086, -122.3551, 2000, Some("sea-042"), 7292, 95, 30, 120),
    Site(4, "req_mono", "Monowi", 40.0, -115.0, 1000, None, 0, 0, 0, 40, offGrid = true))

  /** 16×16 north-up grids at 0.01°/pixel, centered so the site lands on
    * pixel (8,8): col = floor((lon-x0)/dx), row = floor((lat-y0)/dy). */
  val GridW = 16
  val GridH = 16
  val Dx = 0.01
  val Dy = -0.01
  val NoData = -9999.0
  def x0(s: Site): Double = s.lon - (if (s.offGrid) 0.25 else 0.085)
  def y0(s: Site): Double = s.lat + (if (s.offGrid) 0.25 else 0.085)

  /** Vegetation-type pixel field: Grassland-range background (2000-2999,
    * landfire_container.py:68-76) with the golden code at the center. */
  def vegAt(s: Site)(r: Int, c: Int): Double =
    if (r == 8 && c == 8) s.vegCode.toDouble
    else (2000 + ((r * 31 + c * 17 + s.idx * 7) % 97)).toDouble

  /** Fuel-model pixel field over the 90-149 fallback bands
    * (landfire_container.py:77-84). */
  def fuelAt(s: Site)(r: Int, c: Int): Double =
    if (r == 8 && c == 8) s.fuelCode.toDouble
    else (90 + ((r * 29 + c * 19 + s.idx * 11) % 60)).toDouble

  /** Elevation field: integral meters with nodata holes, so every
    * aggregate over it is exact in doubles (bit-identical across
    * engines regardless of fold order). */
  def elevAt(s: Site)(r: Int, c: Int): Double =
    if (((r + s.idx) * (c + 2 * s.idx + 3)) % 19 == 0) NoData
    else (s.elevBase + ((r * 37 + c * 23 + s.idx * 13) % s.elevAmp)).toDouble

  private def grid(f: (Int, Int) => Double): Array[Array[Double]] =
    Array.tabulate(GridH, GridW)((r, c) => f(r, c))

  /** Consolidated LANDFIRE attribute table (the reference caches one CSV
    * per product from remote storage, landfire_container.py:46-65; the
    * engine stages one product-tagged table). Exact-match rows take
    * precedence over the in-code range fallback — including codes that
    * also fall inside a fallback band, which pins the precedence. */
  private val attributeCsvContent: String =
    """product,value,classname
      |vegetation_type,2092,Creosotebush Desert Scrub
      |vegetation_type,3215,Montane Sagebrush Steppe
      |vegetation_type,3232,Lodgepole Pine Forest
      |vegetation_type,7272,Developed-High Intensity
      |vegetation_type,7292,Developed-Medium Intensity
      |vegetation_type,7296,Developed-Roads
      |vegetation_type,7299,Developed-Roads
      |fuel_model,93,NB3 Agricultural
      |fuel_model,95,NB1 Non-burnable Urban
      |fuel_model,104,GR4 Moderate Load Grass
      |fuel_model,122,TL2 Low Load Timber Litter
      |fuel_model,145,SH5 High Load Dry Climate Shrub
      |""".stripMargin

  /** MODIS subset payloads (modis_container.py:240-301): per-site NDVI
    * series with LAST-valid selection (scaled ×1e-4, valid in [-1,1];
    * invalid and empty entries exercised) and LST series with
    * FIRST-valid selection (×0.02 − 273.15, valid in [-50,60]°C). */
  private val modisJsonlContent: String = {
    def e(site: String, product: String, band: String, date: String, data: Seq[Int]) =
      s"""{"site":"$site","product":"$product","band":"$band","calendar_date":"$date","data":[${data.mkString(",")}]}"""
    val ndvi = "250m_16_days_NDVI"
    val lst = "LST_Day_1km"
    Seq(
      e("req_la", "MOD13Q1", ndvi, "2024-03-05", Seq(1400, 1450, 1500, 1520, 1480)),
      e("req_la", "MOD13Q1", ndvi, "2024-03-21", Seq(2000, 2100, 2180, 2210, 2150)),
      e("req_la", "MOD13Q1", ndvi, "2024-04-06", Seq(11000, 11500, 12000, 12100, 11800)),
      e("req_la", "MOD13Q1", ndvi, "2024-04-22", Seq.empty),
      e("req_la", "MOD11A2", lst, "2024-03-05", Seq(16900, 16950, 17000, 17050, 16980)),
      e("req_la", "MOD11A2", lst, "2024-03-21", Seq(15300, 15320, 15340, 15360, 15330)),
      e("req_la", "MOD11A2", lst, "2024-04-06", Seq(15000, 15010, 15020, 15030, 15025)),
      e("req_yellowstone", "MOD13Q1", ndvi, "2024-03-05", Seq(2900, 2920, 2950, 2960, 2940)),
      e("req_yellowstone", "MOD13Q1", ndvi, "2024-03-21", Seq(7000, 7100, 7200, 7250, 7150)),
      e("req_yellowstone", "MOD13Q1", ndvi, "2024-04-06", Seq(6600, 6700, 6800, 6850, 6750)),
      e("req_yellowstone", "MOD13Q1", ndvi, "2024-04-22", Seq(-19000, -19500, -20000, -20100, -19800)),
      e("req_yellowstone", "MOD11A2", lst, "2024-03-05", Seq(13900, 13950, 14000, 14050, 13980)),
      e("req_death_valley", "MOD13Q1", ndvi, "2024-03-05", Seq(700, 750, 800, 820, 790)),
      e("req_death_valley", "MOD13Q1", ndvi, "2024-03-21", Seq(900, 920, 950, 960, 940)),
      e("req_death_valley", "MOD13Q1", ndvi, "2024-04-06", Seq(14000, 14500, 15000, 15200, 14800)),
      e("req_death_valley", "MOD11A2", lst, "2024-03-05", Seq(1900, 1950, 2000, 2050, 1980)),
      e("req_death_valley", "MOD11A2", lst, "2024-03-21", Seq(16100, 16150, 16200, 16250, 16180)),
      e("req_seattle", "MOD13Q1", ndvi, "2024-03-05", Seq(4000, 4050, 4100, 4150, 4080)),
      e("req_seattle", "MOD13Q1", ndvi, "2024-03-21", Seq(3800, 3850, 3900, 3920, 3880)),
      e("req_seattle", "MOD13Q1", ndvi, "2024-04-06", Seq(3100, 3150, 3200, 3230, 3180)),
      e("req_seattle", "MOD13Q1", ndvi, "2024-04-22", Seq(3500, 3550, 3600, 3620, 3580)),
      e("req_seattle", "MOD11A2", lst, "2024-03-05", Seq(14400, 14450, 14500, 14550, 14480))
    ).mkString("", "\n", "\n")
  }

  /** OpenWeatherMap-shaped current+forecast payloads
    * (weather_container.py:146-185); values chosen so the four sites
    * land on all four fire-weather risk classes (:187-233). */
  private val weatherJsonlContent: String = {
    def fc(temp: Double, hum: Int, wind: Double) =
      s"""{"dt":1717254000,"main":{"temp":$temp,"humidity":$hum,"pressure":1011},"wind":{"speed":$wind,"deg":240}}"""
    def w(site: String, name: String, temp: Double, hum: Int, wind: Double,
          main: String, desc: String, fcs: String) =
      s"""{"site":"$site","dt":1717243200,"main":{"temp":$temp,"humidity":$hum,"pressure":1012},"wind":{"speed":$wind,"deg":250},"weather":[{"main":"$main","description":"$desc"}],"visibility":10000,"name":"$name","forecast":[$fcs]}"""
    Seq(
      w("req_la", "Los Angeles", 35.0, 15, 20.0, "Clear", "clear sky",
        Seq(fc(36.5, 18, 16.0), fc(33.0, 22, 12.0), fc(31.5, 45, 8.0), fc(29.0, 55, 4.0)).mkString(",")),
      w("req_yellowstone", "Yellowstone", 21.0, 50, 6.0, "Clouds", "scattered clouds",
        Seq(fc(22.0, 48, 7.0), fc(19.5, 60, 3.0), fc(17.0, 75, 2.0), fc(24.5, 40, 9.0)).mkString(",")),
      w("req_death_valley", "Death Valley", 26.0, 30, 11.0, "Clear", "clear sky",
        Seq(fc(27.5, 28, 12.5), fc(25.0, 35, 9.0), fc(30.5, 25, 14.0), fc(28.0, 30, 10.5)).mkString(",")),
      w("req_seattle", "Seattle", 15.0, 80, 2.0, "Rain", "light rain",
        Seq(fc(16.0, 78, 3.0), fc(14.5, 85, 2.5), fc(13.0, 90, 1.0), fc(17.5, 70, 4.0)).mkString(",")),
      w("req_mono", "Monowi", 18.0, 65, 4.5, "Clouds", "broken clouds",
        Seq(fc(19.0, 62, 5.5), fc(16.5, 70, 3.0)).mkString(","))
    ).mkString("", "\n", "\n")
  }

  private def rasterIndexCsvContent: String = {
    val rows = for {
      s <- sites
      product <- Seq("vegetation_type", "fuel_model", "elevation")
    } yield {
      val fn = s"${productPrefix(product)}_${s.id}.tif"
      s"$fn,${s.id},$product,${x0(s)},$Dx,${y0(s)},$Dy"
    }
    ("file_name,site,product,x0,dx,y0,dy" +: rows).mkString("", "\n", "\n")
  }

  private def productPrefix(product: String): String = product match {
    case "vegetation_type" => "veg"
    case "fuel_model" => "fuel"
    case "elevation" => "elev"
  }

  /** Idempotent staging: writes everything once per JVM/content version. */
  def stage(): Unit = synchronized {
    val marker = Paths.get(Root, s".staged_$Version")
    if (Files.exists(marker)) return
    Files.createDirectories(Paths.get(TextDir))
    Files.createDirectories(Paths.get(RasterDir))
    def writeText(path: String, content: String): Unit =
      Files.write(Paths.get(path), content.getBytes(StandardCharsets.US_ASCII))
    writeText(AttributeCsv, attributeCsvContent)
    writeText(RasterIndexCsv, rasterIndexCsvContent)
    writeText(ModisJsonl, modisJsonlContent)
    writeText(WeatherJsonl, weatherJsonlContent)
    writeText(IngestJsonl, ingestJsonlContent)
    // The raster estate ships in the layouts real tiles actually use
    // (landfire_container.py:89-96 relies on rasterio for exactly this):
    // veg = LZW multi-strip, elev = deflate 16x16-tiled, fuel = legacy
    // uncompressed single-strip. The e2e decode path handles all three
    // transparently, so compressed decode is load-bearing in /collect,
    // not just in the d1_tiff_compressed matrix. Pixel VALUES (and thus
    // every oracle) are unchanged — only the byte layout differs.
    for (s <- sites) {
      Files.write(Paths.get(RasterDir, s"veg_${s.id}.tif"),
        TiffCodec.encodeEx(grid(vegAt(s)), compression = TiffCodec.CompLzw, rowsPerStrip = 4))
      Files.write(Paths.get(RasterDir, s"fuel_${s.id}.tif"), TiffCodec.encode(grid(fuelAt(s))))
      Files.write(Paths.get(RasterDir, s"elev_${s.id}.tif"),
        TiffCodec.encodeEx(grid(elevAt(s)), compression = TiffCodec.CompDeflate, tile = Some((16, 16))))
    }
    Files.write(marker, Array.emptyByteArray)
  }
}

/** Manual staging entry point (prototyping / oracle authoring). */
object StageFixtures {
  def main(args: Array[String]): Unit = {
    Fixtures.stage()
    println(s"staged under ${Fixtures.Root}")
  }
}
