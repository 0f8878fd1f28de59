#!/usr/bin/env python
"""Generate FUNCTIONS.md: reference function surface → our status.

Walks /root/reference/docs/reference/sql/*.qmd (the authoritative public
155-entry surface) and maps each name to this engine's registry.
"""

from __future__ import annotations

import os

REF_DOCS = "/root/reference/docs/reference/sql"

NOTES = {
    # ---- ◐ partial: documented approximation or subset -------------------
    "st_transform": "round 5: parameterized EPSG table (300+ codes — WGS84/ETRS89/NAD83/NAD27/SIRGAS-2000 UTM, GDA94+GDA2020 MGA, Pulkovo-1942 Gauss-Krüger 4-32, Japan Plane Rectangular I-XIX, SPCS83 Lambert zones incl. US-survey-foot axes, national TM/LCC grids) PLUS any '+proj=...' PROJ string (longlat/utm/tmerc/lcc/lcc1sp/aea/polar-stere/laea/merc/webmerc/sinu/ups/somerc/omerc/krovak with +towgs84/+datum/+units/+to_meter) — the two CRS input forms the reference's ST_Transform accepts (st_transform.qmd); hand-verified named entries (3857, NZTM, 2154, 3978, 5070, 3413/3031, 3035, 54008, 3395, UPS, and the Helmert datum tier 27700/31466-69/23028-38, worked-example exact) keep pinned numeric paths; any pair via a 4326 hub (geometry/proj.py); NTv2 grid-shift MECHANISM implemented round 6 (bilinear arc-second grids, iterative inverse, binary .gsb reader/writer, '+nadgrids=' with PROJ's @optional/null semantics, register_shift_grid()/load_ntv2() API; property-tested on synthetic grids) — real NADCON/NTv2 grid FILES are not bundled in this sandbox, so unregistered grids fall back to EPSG mean Helmert, Swiss Oblique Mercator (somerc: CH1903/LV03 21781, CH1903+/LV95 2056, swisstopo rigorous double projection, fundamental-point exact) supported; Hotine omerc supported via '+proj=omerc' (EPSG 9815 centre origin, cross-validated against the independent somerc double projection at azimuth 90); Krovak supported (EPSG:5514 / '+proj=krovak', EPSG GN7-2 worked-example exact); custom ellipsoids via +a/+b or +a/+rf (round 6); round 7 adds six Snyder closed-form families — eqdc (Equidistant Conic, ellipsoidal 2SP), cass (Cassini-Soldner, ellipsoidal series), mill (Miller Cylindrical), moll (Mollweide), eck4 (Eckert IV), robin (Robinson, natural-spline through Robinson's published 5-degree knots) — each with defining-property pins (meridian/parallel true scale, equal-area Jacobian, knot-exact table replay) and the ESRI world codes 54003/54009/54012/54030/102010 in the parametric table",
    "st_knn": "join-only stub, same as the reference (st_knn.rs:25-30); the real operator is operators.knn_join, round 6 adds the SQL entry point the reference plans via KnnJoinEarlyRewrite (optimizer.rs:112-152): sedona_db_spark.sql(spark, 'SELECT ... FROM a JOIN b ON ST_KNN(a.geom, b.geom, k)') executes through knn_join with WHERE applied after neighbor selection, and round 7 implements use_spheroid=True (exact WGS84 Vincenty via ECEF-chord pruning; the reference errors on the flag, spatial_predicate.rs:279-283)",
}

# names that carry an explanatory note but are FULL tier (round-2 upgrades)
FULL_NOTES = {
    "st_geogfromwkb": "alias of ST_GeomFromWKB; spherical tier via ST_AreaSphere/ST_LengthSphere/ST_DistanceSphere (any geometry) + ST_IntersectsSphere/ST_ContainsSphere/ST_DWithinSphere (geometry/sphere.py great-circle kernels; round-4 hardening: pole/dateline/antipodal property suite). Upgraded to full tier in round 5: the FULL-SPHERE oriented mode — ST_IntersectsSphereOriented/ST_ContainsSphereOriented/ST_AreaSphereOriented evaluate interiors as the region LEFT of each directed ring (S2 semantics: larger-than-hemisphere polygons, polar caps, world-minus-cap complements; join position via the SQL theta-join fallback), while the unsuffixed functions keep the smallest-polygon reading that s2geography's default (oriented=false) readers use — so both of S2's reading modes are now expressible; the remaining difference vs S2 is numeric robustness (double-precision crossing tests vs S2 exact predicates), not expressive scope",
    "st_geogfromwkt": "alias of ST_GeomFromText (same spherical tier as ST_GeogFromWKB, incl. the round-5 oriented mode)",
    "st_geogpoint": "alias of ST_Point (same spherical tier)",
    "st_distancesphere": "IUGG mean sphere, all geometry combinations: point×point haversine fast path, any other combo via great-circle kernels (point→arc cross-track clamped to segments, arc×arc crossing minimum) — full combination coverage, driver-oracle-gated (sphere_distances, sphere_line_distance)",
    "st_setsrid": "EWKB SRID embed for per-value interop; round 4 adds the type-level tier — crs.with_crs/set CRS in Spark column metadata (GeoArrow-style {crs, edges}), propagated through spatial_join and GeoParquet write/read without byte rewrites (tests/test_crs.py)",
    "st_setcrs": "metadata-first (crs.with_crs, no byte re-encode) with the EWKB re-encode kept for per-value SQL use — the reference carries CRS in the type (datatypes.rs:404-420); our sidecar is StructField.metadata + the geo footer crs/edges fields",
    "st_crs": "column-metadata CRS when tagged (crs.get_crs), EPSG:<srid> from EWKB per value, else engine default OGC:CRS84",
    "st_polygonize": "full planar noding (round 4, geometry/noding.py): linework split at pairwise intersections, every bounded arrangement face emitted (holes assigned) — reference rows + st_polygonize_agg.rs rows replayed, crossing soups/bowties/grids now polygonize",
    "st_polygonize_agg": "real SQL aggregate (grouped-agg UDF over the same noded face extraction); st_polygonize_agg.rs test rows replayed in tests/test_polygonize_noding.py",
    "st_buffer": "GEOS-parity styled buffer (round 4; round-6 offset-curve rewrite): quad_segs/endcap(round|flat|square)/join(round|mitre|bevel)/mitre_limit/side(left|right|both) with GEOS OffsetSegmentGenerator arc subdivision — the reference's own area rows (test_functions.py:560-744) replay to 1e-9; execution tiers: cross-row batched convex trace (raw-WKB group decode, 42k polys/s single-thread, 100k 10-gons end-to-end SQL 2.6s local[8]), clipped-reflex closed form for concave rings (77% of random stars skip the sweep; 15x round 5), traced open-polyline curves (GEOS getLineCurve shape), pooled collection soups, cross-row flattened winding sweep for the rest — all property-tested region-exact vs the part-soup union; single-sided reflex case pins the PostGIS/GEOS 3.9 value the reference documents (16285.08), GEOS 3.13's artifact-free variant (12713.61, libgeos 091f6d99) noted as a version divergence",
    "st_relate": "DE-9IM for all combos incl. GeometryCollection operands (normalized via the mixed-dimension mod-2 union, GEOS semantics; full reference module replayed)",
    "st_union": "slab overlay + boundary dissolve to minimal-vertex rings (round 2; degenerate inputs fall back to the region-exact tiling)",
    "st_unaryunion": "same dissolve-to-minimal-rings overlay tier",
    "st_difference": "slab overlay + boundary dissolve to minimal-vertex rings (round 2)",
    "st_symdifference": "slab overlay + boundary dissolve to minimal-vertex rings (round 2)",
    "st_intersection": "exact points/lines vs polygons and convex clips; general polygons via slab overlay + dissolve (minimal-vertex output, round 2)",
    "st_union_agg": "via functions.aggregates.union_agg — round 4: all-polygonal groups union in ONE winding slab sweep (linear in group size, not the pairwise quadratic fold)",
    "st_intersection_agg": "via functions.aggregates.intersection_agg (n-way overlay + dissolve)",
    "st_makevalid": "valid→identity; invalid polygons rebuilt by even-odd slab decomposition + dissolve (GEOS linework semantics: bowtie → two triangles); convex hull only as degenerate last resort",
    "st_force3dm": "appends an M dimension with ISO type +2000 (round-2 fix)",
    "st_pointm": "3-coordinate point with the ISO M flag (+2000); ST_M/ST_HasM header-aware",
    "st_zmflag": "reads Z/M from the raw WKB type code (ISO +1000/+2000/+3000 and EWKB flags)",
    "sd_order": "Hilbert-curve position (res 15) of the first coordinate — the same locality property as the reference's S2 cell ordering (S2 positions are per-face Hilbert positions)",
    "rs_bandnodatavalue": "1-arg (band 1) + RS_BandNoDataValueBand(raster, band) any-band variant (Spark SQL cannot overload one UDF name by arity; the reference dispatches by kernel, rs_band_accessors.rs:145-215)",
}

MISSING = {}

OPERATOR_EQUIVALENT = {
    "st_knn": "operators.knn_join",
    "st_envelope_agg": "functions.aggregates.envelope_agg",
    "st_collect_agg": "functions.aggregates.collect_agg + ST_Collect",
    "st_analyze_agg": "functions.aggregates.analyze_agg",
    "st_dump": "ST_Dump (array) + explode",
    "rs_rastertoworldcoord": "RS_RasterToWorldCoordX/Y + RS_PixelAsPoint",
    "rs_worldtorastercoord": "RS_WorldToRasterCoordX/Y",
}


def main():
    from sedona_db_spark.functions.scalar import UDFS
    from sedona_db_spark.functions.scalar2 import UDFS2
    from sedona_db_spark.functions.scalar3 import UDFS3
    from sedona_db_spark.functions.scalar4 import UDFS4
    from sedona_db_spark.raster.functions import RS_UDFS

    registered = {k.lower() for k in
                  list(UDFS) + list(UDFS2) + list(UDFS3) + list(UDFS4)
                  + list(RS_UDFS)}
    registered |= {"st_reduceprecision", "st_geomfromewkt", "st_geogfromwkt",
                   "st_geomfromewkb", "st_geogfromwkb", "st_geogpoint",
                   "st_force3dm"}
    agg_helpers = {"st_envelope_agg", "st_collect_agg", "st_analyze_agg",
                   "st_union_agg", "st_intersection_agg",
                   "st_polygonize_agg"}

    names = sorted(
        f[:-4] for f in os.listdir(REF_DOCS)
        if f.endswith(".qmd") and (f.startswith("st_") or f.startswith("rs_")
                                   or f.startswith("sd_")))

    rows = []
    n_ok = n_partial = n_missing = 0
    for name in names:
        note = NOTES.get(name, "") or FULL_NOTES.get(name, "")
        if name in MISSING:
            status = "✗ missing"
            note = MISSING[name]
            n_missing += 1
        elif name in registered or name in agg_helpers or name in OPERATOR_EQUIVALENT:
            if name in NOTES:
                status = "◐ partial"
                n_partial += 1
            else:
                status = "✓"
                n_ok += 1
            if name in OPERATOR_EQUIVALENT:
                note = (note + "; " if note else "") + f"via {OPERATOR_EQUIVALENT[name]}"
        else:
            status = "✗ missing"
            n_missing += 1
        rows.append((name, status, note))

    with open("/root/repo/FUNCTIONS.md", "w") as f:
        f.write("# FUNCTIONS — parity map vs the reference surface\n\n")
        f.write("Reference surface = the %d documented SQL functions at\n"
                "`/root/reference/docs/reference/sql/*.qmd`.  Status: ✓ full "
                "semantics, ◐ implemented with a documented approximation/"
                "subset, ✗ not implemented (reason given).\n\n" % len(names))
        f.write("**%d ✓ full · %d ◐ partial · %d ✗ missing** of %d.\n\n"
                % (n_ok, n_partial, n_missing, len(names)))
        f.write("| reference function | status | notes |\n|---|---|---|\n")
        for name, status, note in rows:
            f.write(f"| `{name}` | {status} | {note} |\n")
        f.write("\nBeyond-reference additions: grid cells (`SD_Cell`, "
                "`SD_CellXY`), `ST_DistanceSphere`/`ST_AreaSphere`/`ST_LengthSphere` (geography-lite), `RS_Value`, `ST_GeomFromGeoJSON`, spatial-join/"
                "kNN/sessionize operators, dedup (exact, MinHash-LSH, SimHash, "
                "n-gram Jaccard), embedding ANN, text analysis, multimodal "
                "metadata, structured-streaming cell counts, resumable "
                "checkpointed runs, geo-clustered parquet store.\n")
    print(f"FUNCTIONS.md: {n_ok} ok, {n_partial} partial, {n_missing} missing"
          f" of {len(names)}")


if __name__ == "__main__":
    main()
