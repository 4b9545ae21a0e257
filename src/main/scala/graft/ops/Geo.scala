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

  /** TABLE-driven point-in-polygon zone tagging — [[pointInPolygon]]'s
    * literal-expression form compiles K zones into the plan, which is
    * right for a handful of regions and wrong for a 10⁴-polygon zone
    * table (the plan would be megabytes of generated code). This form
    * takes the zones as DATA: `zones` carries (zone, vertices) with
    * `vertices: array<struct<lat: double, lon: double>>` (closed
    * implicitly), and containment is decided in three stages:
    *  1. bounding-box grid prefilter (the [[nearestWithinRadius]] cell
    *     device): each zone replicates to every `cellKm`-wide cell its
    *     bbox covers, each point lands in its one cell — a point inside
    *     a polygon is inside its bbox, so its cell is covered and the
    *     prefilter can lose nothing;
    *  2. candidate (point, zone) EQUI-join on the cell key — candidate
    *     volume is points × (zone bboxes per cell), never points ×
    *     zones, and the join is shuffle-partitioned/AQE-skew-splittable;
    *  3. exact crossing-number verify on the candidate's exploded edge
    *     array — the SAME IEEE compare/multiply/divide tree as the
    *     literal form evaluated over vertex DATA instead of constants
    *     (subtraction of the same doubles is exactly rounded, so the
    *     two forms agree bit-for-bit; Round10OpsSpec pins the
    *     equivalence on the q321 zones).
    * Returns ALL containment pairs (point_id, zone) — overlapping zones
    * each emit a row; callers wanting first-match-wins fold afterwards.
    * Horizontal edges never count as crossings (the [[pointInPolygon]]
    * rule); same non-null-coordinate precondition as the other paths.
    */
  def zoneTagJoin(points: DataFrame, pointId: Column,
                  pLat: Column, pLon: Column,
                  zones: DataFrame, zoneName: Column, vertices: Column,
                  cellKm: Double, cosLat0: Double): DataFrame = {
    require(cellKm > 0.0, s"cellKm must be > 0, got $cellKm")
    val kx = KmPerDeg * cosLat0
    def cellX(lon: Column): Column = floor(lon * lit(kx) / lit(cellKm)).cast("long")
    def cellY(lat: Column): Column =
      floor(lat * lit(KmPerDeg) / lit(cellKm)).cast("long")
    val p = points.select(pointId.as("point_id"),
        pLat.as("__plat"), pLon.as("__plon"))
      .withColumn("__cx", cellX(col("__plon")))
      .withColumn("__cy", cellY(col("__plat")))
    val z = zones.select(zoneName.as("zone"), vertices.as("__verts"))
      .withColumn("__latmin",
        array_min(transform(col("__verts"), v => v.getField("lat"))))
      .withColumn("__latmax",
        array_max(transform(col("__verts"), v => v.getField("lat"))))
      .withColumn("__lonmin",
        array_min(transform(col("__verts"), v => v.getField("lon"))))
      .withColumn("__lonmax",
        array_max(transform(col("__verts"), v => v.getField("lon"))))
      .withColumn("__cx", explode(sequence(cellX(col("__lonmin")),
        cellX(col("__lonmax")))))
      .withColumn("__cy", explode(sequence(cellY(col("__latmin")),
        cellY(col("__latmax")))))
      .select(col("zone"), col("__verts"), col("__cx"), col("__cy"))
    val nv = size(col("__verts"))
    // crossing-number over the edge array: edge i = verts[i] → verts[(i+1) % n]
    val crossings = size(filter(sequence(lit(0), nv - 1), i => {
      val v1 = element_at(col("__verts"), i + 1)
      val v2 = element_at(col("__verts"), pmod(i + 1, nv) + 1)
      val y1 = v1.getField("lat"); val x1 = v1.getField("lon")
      val y2 = v2.getField("lat"); val x2 = v2.getField("lon")
      val xint = (x2 - x1) * (col("__plat") - y1) / (y2 - y1) + x1
      (y1 =!= y2) && ((y1 > col("__plat")) =!= (y2 > col("__plat"))) &&
        (col("__plon") < xint)
    }))
    p.join(z, Seq("__cx", "__cy"))
      .filter(pmod(crossings, lit(2)) === 1)
      .select(col("point_id"), col("zone"))
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
