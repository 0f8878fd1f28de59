#!/usr/bin/env python
"""Generate FUNCTIONS.md: reference function surface → our status.

Walks /root/reference/docs/reference/sql/*.qmd (the authoritative public
155-entry surface) and maps each name to this engine's registry.
"""

from __future__ import annotations

import os

REF_DOCS = "/root/reference/docs/reference/sql"

NOTES = {
    "st_concavehull": "edge-digging approximation (reference: GEOS ConcaveHull)",
    "st_makevalid": "valid→identity; invalid→convex-hull fallback (approx tier)",
    "st_simplifypreservetopology": "Douglas–Peucker tier (reference: GEOS topology-preserving)",
    "st_union": "region-exact slab-overlay union (trapezoid decomposition, not GEOS minimal-vertex form)",
    "st_unaryunion": "same region-exact overlay tier",
    "st_intersection": "exact: points/lines vs polygons, convex clips minimal-form; general polygons via slab overlay",
    "st_difference": "region-exact slab overlay (trapezoid form)",
    "st_symdifference": "region-exact slab overlay (trapezoid form)",
    "st_union_agg": "via functions.aggregates.union_agg (n-way slab overlay)",
    "st_intersection_agg": "via functions.aggregates.intersection_agg",
    "st_transform": "built-in EPSG:4326/OGC:CRS84 ↔ EPSG:3857 (reference: PROJ, any CRS)",
    "st_buffer": "Minkowski-sum buffer via slab-overlay union (exact up to the standard quad_segs disc discretization); erosion for negative d",
    "st_knn": "join-only stub, same as the reference (st_knn.rs:25-30); use operators.knn_join",
    "st_geogfromwkb": "alias of ST_GeomFromWKB; spherical measures via ST_AreaSphere/ST_LengthSphere/ST_DistanceSphere",
    "st_geogfromwkt": "alias of ST_GeomFromText (planar tier)",
    "st_geogpoint": "alias of ST_Point (planar tier)",
    "st_force3dm": "ISO WKB cannot tag M-only; maps to 3-D (Z slot)",
    "st_pointm": "3rd/4th dims not distinguishable as M in ISO WKB",
    "st_zmflag": "M-only flag (1) unreachable through ISO WKB",
    "sd_order": "fine-grid cell of first coordinate (reference: S2 cell id)",
    "st_setsrid": "re-encodes as EWKB with embedded SRID (type-level CRS analogue)",
    "st_setcrs": "same mechanism as ST_SetSRID",
    "st_crs": "EPSG:<srid> from EWKB, else engine default OGC:CRS84",
    "st_distancesphere": "haversine on the IUGG mean sphere",
    "rs_bandnodatavalue": "band 1; 8-byte little-endian double or single byte",
    "st_relate": "DE-9IM for all Point/Line/Polygon combos (golden-tested); exotic collection mixes unverified",
    "st_polygonize": "merge-connected-rings tier (full planar noding of edge soups is GEOS territory)",
    "st_polygonize_agg": "via collect_list + ST_Polygonize",
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
        note = NOTES.get(name, "")
        if name in MISSING:
            status = "✗ missing"
            note = MISSING[name]
            n_missing += 1
        elif name in registered or name in agg_helpers or name in OPERATOR_EQUIVALENT:
            if note:
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
