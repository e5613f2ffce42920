package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY §2.1 request CONSTRUCTION — the half of the connector story
  * upstream of the fetch: the reference builds each container's request
  * URL from the request row (WCS GetCoverage landfire_container.py:255-272,
  * ORNL subset modis_container.py:140-149, OpenWeatherMap
  * weather_container.py:108-117/:129-136, USGS exportImage
  * topography_container.py:111-126). These builders are pure `Column`
  * expressions (concat/format_string — whole-stage codegen'd, no UDF),
  * so a million-request table becomes a million URLs in one projection,
  * ready for [[RestFetch.fetchRows]] / [[graft.sources.RestSource]].
  *
  * Query-parameter ORDER follows each reference dict exactly.
  * Coordinates are canonicalized: degrees to 6 decimals (≈0.1 m),
  * Web-Mercator meters to 2 decimals (cm) — Python's float repr is not
  * reproducible across engines, and the endpoints parse both forms
  * identically.
  */
object RequestUrls {

  private def deg(c: Column): Column = format_string("%.6f", c.cast("double"))
  private def m(c: Column): Column = format_string("%.2f", c.cast("double"))

  /** buffer_meters → degrees, the reference's flat-earth approximation
    * (landfire_container.py:221). */
  def bufferDeg(bufferM: Column): Column = bufferM.cast("double") / 111000.0

  /** `lon-d,lat-d,lon+d,lat+d` — WCS 1.0.0 EPSG:4326 bbox
    * (landfire_container.py:259). */
  def bboxDeg(lat: Column, lon: Column, bufferM: Column): Column = {
    val d = bufferDeg(bufferM)
    concat_ws(",", deg(lon - d), deg(lat - d), deg(lon + d), deg(lat + d))
  }

  /** EPSG:3857 Web-Mercator projection (topography_container.py:78-83);
    * same formula as the x5 scalar query / DuckDB oracle. */
  def mercatorX(lon: Column): Column = lon * (6378137.0 * math.Pi / 180.0)
  def mercatorY(lat: Column): Column =
    log(tan(lit(math.Pi / 4.0) + lat * (math.Pi / 360.0))) * 6378137.0

  /** LANDFIRE WCS GetCoverage (landfire_container.py:262-272; coverage
    * takes the part of the layer name after `__`, :266). */
  def landfireWcs(endpoint: Column, layerCode: Column, lat: Column, lon: Column,
                  bufferM: Column): Column =
    concat(endpoint, lit("?service=WCS&version=1.0.0&request=GetCoverage"),
      lit("&coverage=landfire_wcs:"), layerCode,
      lit("&bbox="), bboxDeg(lat, lon, bufferM),
      lit("&crs=EPSG:4326&format=GeoTIFF&width=256&height=256"))

  /** `AYYYYDDD` MODIS date (modis_container.py:97). */
  def modisDate(d: Column): Column =
    concat(lit("A"), year(d).cast("string"), lpad(dayofyear(d).cast("string"), 3, "0"))

  /** ORNL subset request (modis_container.py:140-149). */
  def modisSubset(base: Column, product: Column, lat: Column, lon: Column,
                  startDate: Column, endDate: Column): Column =
    concat(base, lit("/"), product, lit("/subset"),
      lit("?latitude="), deg(lat), lit("&longitude="), deg(lon),
      lit("&startDate="), modisDate(startDate), lit("&endDate="), modisDate(endDate),
      lit("&kmAboveBelow=1&kmLeftRight=1"))

  /** OpenWeatherMap current / 5-day forecast
    * (weather_container.py:108-117, :129-136). */
  def weatherUrl(base: Column, path: Column, lat: Column, lon: Column,
                 apiKey: Column): Column =
    concat(base, lit("/"), path,
      lit("?lat="), deg(lat), lit("&lon="), deg(lon),
      lit("&appid="), apiKey, lit("&units=metric"))

  /** USGS ImageServer exportImage over a Web-Mercator meter bbox
    * (topography_container.py:78-83, :111-126). */
  def usgsExportImage(endpoint: Column, lat: Column, lon: Column,
                      bufferM: Column): Column = {
    val cx = mercatorX(lon)
    val cy = mercatorY(lat)
    val b = bufferM.cast("double")
    concat(endpoint, lit("/exportImage?f=image"),
      lit("&bbox="), concat_ws(",", m(cx - b), m(cy - b), m(cx + b), m(cy + b)),
      lit("&bboxSR=3857&imageSR=4326&size=256,256&format=tiff&pixelType=F32"),
      lit("&interpolation=RSP_BilinearInterpolation"))
  }
}
