package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic geospatial enrichment — the nearest-centroid /
  * radius-join family the reference's subject matter implies (the
  * reference ETL processes Brazilian municipal employment data keyed by
  * municipality name and enriched with IBGE codes:
  * `consolidado_municipios_final.csv`'s `Município` column,
  * `pipeline.py:95-118`'s codigo_ibge merge): "which municipality seat
  * is this record closest to" is the canonical geo-enrich step such a
  * pipeline runs when records carry coordinates instead of clean names.
  *
  * Metric: squared EQUIRECTANGULAR distance in km² — Δlat and
  * Δlon·cos(lat₀) scaled by the km-per-degree constant, lat₀ a FIXED
  * caller literal. Over a country-sized extent the projection's nearest
  * neighbor agrees with haversine's except for near-equidistant pairs
  * (the standard small-extent approximation); what it buys here is
  * DETERMINISM: the whole metric is IEEE +,−,× (each correctly rounded,
  * bit-identical in every engine), where haversine's sin/asin are
  * libm-dependent and could flip an argmin across engines. The readout
  * distance adds one `sqrt` — also correctly rounded by IEEE-754, so
  * still engine-exact.
  *
  * Scale shape: centroid tables are small by nature (Brazil has 5 570
  * municipalities — kilobytes), so [[nearestCentroid]] broadcasts them
  * and the corpus never shuffles to be scored; the one shuffle is the
  * per-point argmin fold, map-side-combined to one row per point. When
  * the centroid side is too large to broadcast, [[nearestWithinRadius]]
  * grid-blocks BOTH sides at `radiusKm`-sized cells and equi-joins on
  * the cell key — candidate volume is points × (centroids per 3×3
  * block), never points × centroids.
  */
object Geo {

  /** Mean km per degree of latitude (and of longitude at the equator). */
  val KmPerDeg = 111.195d

  /** Uniform draw in [0, 1) from the repo's md5 position — the exact
    * division by 2³² is lossless, so the coordinate synthesis built on
    * it is engine-replayable bit-for-bit.
    */
  def unitPos(salt: String, id: Column): Column =
    Sampling.hashPos(lit(salt), id).cast("double") / lit(4294967296.0d)

  /** Synthetic latitude in the Brazil bounding box [−33.75, 5.0) —
    * deterministic per id (the testdata carries no coordinates; a real
    * deployment drops these two lines for its lat/lon columns).
    */
  def synthLat(id: Column): Column =
    lit(-33.75d) + unitPos("lat", id) * lit(38.75d)

  /** Synthetic longitude in the Brazil bounding box [−73.99, −34.79). */
  def synthLon(id: Column): Column =
    lit(-73.99d) + unitPos("lon", id) * lit(39.2d)

  /** Squared equirectangular distance in km² between two (lat, lon)
    * pairs; `cosLat0` is the caller's fixed projection constant (cosine
    * of the extent's central latitude, passed as a literal so both the
    * engine and any replaying oracle use the identical decimal).
    */
  def equirectKm2(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                  cosLat0: Double): Column = {
    val dy = (lat1 - lat2) * lit(KmPerDeg)
    val dx = (lon1 - lon2) * lit(KmPerDeg * cosLat0)
    dx * dx + dy * dy
  }

  /** Exact nearest-centroid assignment: every point gets the centroid
    * minimizing [[equirectKm2]], ties broken by smallest centroid id —
    * a total, engine-portable order. Returns
    * (point_id, centroid_id, dist_km). PRECONDITION (both paths):
    * coordinates must be non-null — a null lat/lon makes the distance
    * null, whose placement under the argmin fold is engine-specific;
    * filter or impute upstream.
    *
    * Plan: the centroid frame BROADCASTS into a nested-loop join (the
    * K-row dim × corpus shape — the corpus never shuffles to be
    * scored), then ONE groupBy(point) whose `min(struct(d², cid))` is
    * map-side partial: each task folds its K candidates per point
    * locally, so the shuffle carries exactly one row per point
    * regardless of K. No window, no join-back, no driver collect.
    * Struct min is sort-agg-only in Spark, so the partial fold pays
    * one per-partition sort of the pair frame — the documented
    * log-factor trade for a tie-deterministic argmin in a single
    * operator (the alternative, a hash-agg min(d²) plus a join-back
    * and a tie fold, re-reads the pair frame and shuffles twice).
    */
  def nearestCentroid(points: DataFrame, pointId: Column,
                      pLat: Column, pLon: Column,
                      centroids: DataFrame, centroidId: Column,
                      cLat: Column, cLon: Column,
                      cosLat0: Double): DataFrame = {
    val c = centroids.select(centroidId.as("__cid"),
      cLat.as("__clat"), cLon.as("__clon"))
    val p = points.select(pointId.as("point_id"),
      pLat.as("__plat"), pLon.as("__plon"))
    p.join(broadcast(c))
      .withColumn("__d2", equirectKm2(col("__plat"), col("__plon"),
        col("__clat"), col("__clon"), cosLat0))
      .groupBy(col("point_id"))
      .agg(min(struct(col("__d2"), col("__cid"))).as("__best"))
      .select(col("point_id"), col("__best.__cid").as("centroid_id"),
        sqrt(col("__best.__d2")).as("dist_km"))
  }

  /** Point-in-polygon containment by the crossing-number (odd–even)
    * rule: a horizontal ray from the point crosses the polygon's edges
    * an odd number of times iff the point is inside. The polygon is a
    * caller-fixed literal vertex list in (lat, lon) order (closed
    * implicitly), so every edge constant — Δx, Δy, the vertex
    * coordinates — is compiled into the expression, and the whole test
    * is IEEE compare/multiply/divide on identical trees in any
    * replaying engine: bit-deterministic except for points EXACTLY on
    * an edge (measure-zero; both engines still agree, since they
    * evaluate the same arithmetic). Pure map-side codegen — the
    * "which state/region is this record in" enrich tag costs zero
    * shuffle at any corpus size. Non-convex polygons work (the rule is
    * the general one); holes = test the hole polygon separately.
    */
  def pointInPolygon(lat: Column, lon: Column,
                     poly: Seq[(Double, Double)]): Column = {
    require(poly.length >= 3, s"polygon needs >= 3 vertices, got ${poly.length}")
    val crossings = poly.indices.map { i =>
      val (y1, x1) = poly(i)
      val (y2, x2) = poly((i + 1) % poly.length)
      if (y1 == y2) lit(0) // horizontal edge: never crossed by the ray rule
      else {
        val cond = (lit(y1) > lat) =!= (lit(y2) > lat)
        val xint = lit(x2 - x1) * (lat - lit(y1)) / lit(y2 - y1) + lit(x1)
        when(cond && lon < xint, 1).otherwise(0)
      }
    }
    crossings.reduce(_ + _) % 2 === 1
  }

  /** Radius-bounded nearest centroid WITHOUT broadcasting: both sides
    * land in a square grid of `radiusKm`-wide cells in the projected km
    * plane; centroids replicate to their 3×3 cell neighborhood and the
    * match is an EQUI-join on the cell key. Any centroid within
    * `radiusKm` of a point shares one of the point's 9 cells (outside
    * the block, one axis already exceeds a full cell width), so for
    * points whose nearest centroid lies within the radius the result
    * EQUALS [[nearestCentroid]]'s; points with no centroid in range are
    * absent (the caller left-joins if unmatched rows matter). That
    * containment law is spec-pinned against the broadcast path.
    *
    * This is the shape that survives a centroid side too big to
    * broadcast (POI catalogs, parcel databases): candidate volume is
    * points × centroids-per-block — corpus-linear for any fixed spatial
    * density — and the join is a plain shuffle-partitioned equi-join on
    * the cell key, AQE-skew-splittable when density is uneven.
    */
  def nearestWithinRadius(points: DataFrame, pointId: Column,
                          pLat: Column, pLon: Column,
                          centroids: DataFrame, centroidId: Column,
                          cLat: Column, cLon: Column,
                          radiusKm: Double, cosLat0: Double): DataFrame = {
    require(radiusKm > 0.0, s"radiusKm must be > 0, got $radiusKm")
    def cellX(lon: Column): Column =
      floor(lon * lit(KmPerDeg * cosLat0) / lit(radiusKm)).cast("long")
    def cellY(lat: Column): Column =
      floor(lat * lit(KmPerDeg) / lit(radiusKm)).cast("long")
    val p = points.select(pointId.as("point_id"),
        pLat.as("__plat"), pLon.as("__plon"))
      .withColumn("__cx", cellX(col("__plon")))
      .withColumn("__cy", cellY(col("__plat")))
    val offsets = array((for (i <- -1 to 1; j <- -1 to 1)
      yield struct(lit(i.toLong).as("dx"), lit(j.toLong).as("dy"))): _*)
    val c = centroids.select(centroidId.as("__cid"),
        cLat.as("__clat"), cLon.as("__clon"))
      .withColumn("__o", explode(offsets))
      .select(col("__cid"), col("__clat"), col("__clon"),
        (cellX(col("__clon")) + col("__o.dx")).as("__cx"),
        (cellY(col("__clat")) + col("__o.dy")).as("__cy"))
    p.join(c, Seq("__cx", "__cy"))
      .withColumn("__d2", equirectKm2(col("__plat"), col("__plon"),
        col("__clat"), col("__clon"), cosLat0))
      .filter(col("__d2") <= lit(radiusKm * radiusKm))
      .groupBy(col("point_id"))
      .agg(min(struct(col("__d2"), col("__cid"))).as("__best"))
      .select(col("point_id"), col("__best.__cid").as("centroid_id"),
        sqrt(col("__best.__d2")).as("dist_km"))
  }
}
