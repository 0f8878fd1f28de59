"""Geo-clustered parquet storage: the engine's GeoParquet analogue.

The reference prunes GeoParquet files and row groups by the `geo` metadata
bbox and the GeoParquet 1.1 ``covering.bbox`` struct column's min/max
statistics (/root/reference/rust/sedona-geoparquet/src/file_opener.rs:282-332,
writer.rs:315-414).  On Spark the same effect is ordinary columns + layout:

- ``write_geo``: derive bbox covering columns (bbox_xmin/ymin/xmax/ymax)
  and the grid cell id, range-repartition + sort by cell (Hilbert-ish
  spatial clustering — the ``sd_order`` precedent,
  /root/reference/c/sedona-proj/src/sd_order_lnglat.rs:32-60), write
  parquet.  Sorted-by-cell row groups make min/max stats tight.
- ``read_geo`` + ``bbox_filter``: plain column predicates that Catalyst
  pushes into the parquet scan (visible as PushedFilters in explain) —
  files and row groups outside the query bbox never leave disk.
- partitioned variant: ``partition_cells`` coarse cells become directory
  partitions → partition pruning on top of row-group pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from sedona_db_spark import grid

BBOX_COLS = ("bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax")


def with_covering(df: DataFrame, geom_col: str = "geom",
                  res: int = 7, partition_res: int | None = None) -> DataFrame:
    """Add bbox covering + cell columns.

    The clustering cell comes from the bbox MIDPOINT via pure JVM
    arithmetic over the just-computed bbox columns — correct for any
    geometry type (the round-1 point-decoder UDF yielded one garbage cell
    for every non-point row, destroying the sort clustering)."""
    from sedona_db_spark.functions.scalar import (
        st_xmin, st_ymin, st_xmax, st_ymax)
    g = F.col(geom_col)
    out = (df.withColumn("bbox_xmin", st_xmin(g))
             .withColumn("bbox_ymin", st_ymin(g))
             .withColumn("bbox_xmax", st_xmax(g))
             .withColumn("bbox_ymax", st_ymax(g)))
    mid_x = "((bbox_xmin + bbox_xmax) / 2)"
    mid_y = "((bbox_ymin + bbox_ymax) / 2)"
    out = out.withColumn("cell", F.expr(grid.cell_expr_sql(mid_x, mid_y, res)))
    if partition_res is not None:
        out = out.withColumn(
            "pcell", F.expr(grid.cell_expr_sql(mid_x, mid_y, partition_res)))
    return out


def write_geo(df: DataFrame, path: str, geom_col: str = "geom",
              res: int = 7, partition_res: int | None = None,
              files: int | None = None) -> None:
    """Write a spatially-clustered geo table.

    Rows are range-partitioned and sorted by cell id so each parquet row
    group covers a compact spatial window (tight min/max stats == effective
    pruning).  With ``partition_res``, coarse cells become hive partitions.
    """
    out = with_covering(df, geom_col, res, partition_res)
    if files:
        out = out.repartitionByRange(files, "cell")
    out = out.sortWithinPartitions("cell")
    writer = out.write.mode("overwrite")
    if partition_res is not None:
        writer = writer.partitionBy("pcell")
    writer.parquet(path)


def read_geo(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_parquet_geo(spark: SparkSession, path: str, geom_col: str = "geom",
                     validate: bool = False) -> DataFrame:
    """Read a parquet dataset whose ``geom_col`` holds WKB, optionally
    validating every value parses (the reference's
    ``read_parquet(..., geometry_columns=..., validate=True)`` —
    python/sedonadb/tests/io/test_parquet.py:486-559).  ``validate=True``
    scans once and raises ``ValueError("WKB validation failed: ...")``
    when any non-null value is unparseable, matching the reference's
    materialization-time SedonaError."""
    df = spark.read.parquet(path)
    if validate:
        from sedona_db_spark.functions.scalar4 import sd_wkb_is_parseable
        bad = df.where(
            F.col(geom_col).isNotNull()
            & ~sd_wkb_is_parseable(F.col(geom_col))).count()
        if bad:
            raise ValueError(
                f"WKB validation failed: {bad} unparseable value(s) in "
                f"column {geom_col!r}")
    return df


def bbox_filter(qxmin: float, qymin: float, qxmax: float, qymax: float) -> Column:
    """bbox-intersects predicate over the covering columns — plain
    comparisons, so Catalyst pushes them to the parquet scan (min/max
    row-group pruning; the Spark analogue of the reference's
    row_groups_spatial_pruned metric)."""
    return ((F.col("bbox_xmin") <= qxmax) & (F.col("bbox_xmax") >= qxmin)
            & (F.col("bbox_ymin") <= qymax) & (F.col("bbox_ymax") >= qymin))


def spatial_read(spark: SparkSession, path: str, bbox: tuple,
                 geom_col: str = "geom", exact: bool = True) -> DataFrame:
    """Read only the spatial window ``bbox`` = (xmin, ymin, xmax, ymax).

    Two tiers, mirroring the reference's scan pruning (§4.3): pushed bbox
    column predicates (file/row-group pruning) + exact geometry refine.
    """
    df = read_geo(spark, path).where(bbox_filter(*bbox))
    if exact:
        from sedona_db_spark.functions.scalar import st_intersects, st_geomfromtext
        xmin, ymin, xmax, ymax = bbox
        wkt = (f"POLYGON (({xmin} {ymin}, {xmax} {ymin}, {xmax} {ymax}, "
               f"{xmin} {ymax}, {xmin} {ymin}))")
        df = df.where(st_intersects(F.col(geom_col), st_geomfromtext(F.lit(wkt))))
    return df


def pruning_stats(path: str, bbox: tuple,
                  xmin_col: str = "bbox_xmin", ymin_col: str = "bbox_ymin",
                  xmax_col: str = "bbox_xmax", ymax_col: str = "bbox_ymax"
                  ) -> dict:
    """File- and row-group-level spatial pruning counts for a bbox query —
    the observable mirror of the reference's ``files_ranges_spatial_pruned``
    and ``row_groups_spatial_pruned`` scan metrics
    (rust/sedona-geoparquet/src/file_opener.rs:63-96).

    Applies the SAME min/max-statistics overlap rule Spark's parquet
    reader uses for the pushed ``bbox_filter`` predicates, by walking the
    parquet footers with pyarrow: a file/row-group is pruned when its
    stats window cannot intersect the query bbox.  Returned counts let
    tests assert pruning actually happens (round-4 VERDICT #5), rather
    than inferring it from PushedFilters text alone."""
    import os
    import pyarrow.parquet as pq
    qxmin, qymin, qxmax, qymax = bbox
    files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path) for f in fs
        if f.endswith(".parquet") and not f.startswith(("_", ".")))
    out = {"files_total": 0, "files_pruned": 0,
           "row_groups_total": 0, "row_groups_pruned": 0,
           "rows_total": 0, "rows_after_prune": 0}
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        cols = (xmin_col, ymin_col, xmax_col, ymax_col)
        if any(c not in idx for c in cols):
            raise ValueError(f"{fp}: covering columns {cols} not present")
        out["files_total"] += 1
        file_kept = False
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            out["row_groups_total"] += 1
            out["rows_total"] += g.num_rows
            st = {c: g.column(idx[c]).statistics for c in cols}
            if any(s is None or not s.has_min_max for s in st.values()):
                keep = True  # no stats: cannot prune
            else:
                # bbox-intersects is possible only if the stats windows
                # admit it: min(bbox_xmin) <= qxmax, max(bbox_xmax) >= qxmin
                keep = (st[xmin_col].min <= qxmax
                        and st[xmax_col].max >= qxmin
                        and st[ymin_col].min <= qymax
                        and st[ymax_col].max >= qymin)
            if keep:
                file_kept = True
                out["rows_after_prune"] += g.num_rows
            else:
                out["row_groups_pruned"] += 1
        if not file_kept:
            out["files_pruned"] += 1
    return out


# ---------------------------------------------------------------------------
# GeoParquet 1.1 interop: standard `geo` footer metadata + covering.bbox
# struct column, so files round-trip with GeoPandas / DuckDB-spatial / the
# reference (rust/sedona-geoparquet/src/writer.rs:278-414, metadata.rs:285-380)
# ---------------------------------------------------------------------------

GEOPARQUET_VERSION = "1.1.0"


def _crs_projjson(crs: str | None):
    """Minimal PROJJSON id object for the `geo` footer (the spec's `crs`
    field; null means the OGC:CRS84 default, matching the reference's
    sedona-schema serialization of lon/lat)."""
    if not crs or crs.upper() in ("OGC:CRS84", "EPSG:4326", "CRS84"):
        return None
    auth, _, code = crs.partition(":")
    if code:
        return {"id": {"authority": auth.upper(), "code": int(code)
                       if code.isdigit() else code}}
    return {"id": {"authority": "EPSG", "code": crs}}


def _geo_metadata_json(geom_col: str, bbox: list, geometry_types: list,
                       covering_col: str = "bbox", crs: str | None = None,
                       edges: str = "planar") -> str:
    import json
    col = {
        "encoding": "WKB",
        "geometry_types": sorted(geometry_types),
        "bbox": bbox,
        "covering": {"bbox": {
            "xmin": [covering_col, "xmin"],
            "ymin": [covering_col, "ymin"],
            "xmax": [covering_col, "xmax"],
            "ymax": [covering_col, "ymax"],
        }},
    }
    col["crs"] = _crs_projjson(crs)
    if edges and edges != "planar":
        col["edges"] = edges
    return json.dumps({
        "version": GEOPARQUET_VERSION,
        "primary_column": geom_col,
        "columns": {geom_col: col},
    })


def write_geoparquet(df: DataFrame, path: str, geom_col: str = "geom",
                     res: int = 7, files: int | None = None) -> None:
    """Write spec-compliant GeoParquet 1.1: WKB geometry column, a
    ``bbox`` struct covering column (xmin/ymin/xmax/ymax — row-group
    min/max stats on its fields drive external engines' pruning), rows
    cell-sorted for tight stats, and the ``geo`` footer key.

    Spark's writer cannot attach custom footer key-values, so the footer is
    stamped in a distributed post-pass (one pyarrow rewrite per file, local
    filesystems; each task rewrites only its own file).
    """
    from sedona_db_spark.functions.scalar import (
        st_geometrytype, st_xmin, st_ymin, st_xmax, st_ymax)
    g = F.col(geom_col)
    out = (df.withColumn("bbox", F.struct(
                st_xmin(g).alias("xmin"), st_ymin(g).alias("ymin"),
                st_xmax(g).alias("xmax"), st_ymax(g).alias("ymax")))
             .withColumn("__cell", F.expr(grid.cell_expr_sql(
                 "((bbox.xmin + bbox.xmax) / 2)",
                 "((bbox.ymin + bbox.ymax) / 2)", res))))
    if files:
        out = out.repartitionByRange(files, "__cell")
    out = out.sortWithinPartitions("__cell").drop("__cell")
    out.write.mode("overwrite").parquet(path)

    # one aggregation pass for the file-level metadata (global bbox + types)
    stats = df.select(
        F.min(st_xmin(g)).alias("x0"), F.min(st_ymin(g)).alias("y0"),
        F.max(st_xmax(g)).alias("x1"), F.max(st_ymax(g)).alias("y1"),
        F.collect_set(st_geometrytype(g)).alias("types")).collect()[0]
    types = [t.replace("ST_", "") for t in (stats["types"] or [])]
    # column-metadata CRS/edges ride into the footer (type-level CRS tier:
    # the Spark analogue of the reference's GeoArrow field metadata,
    # rust/sedona-schema/src/datatypes.rs:404-420)
    from sedona_db_spark import crs as _crs
    meta = _geo_metadata_json(
        geom_col, [stats["x0"], stats["y0"], stats["x1"], stats["y1"]], types,
        crs=_crs.get_crs(df, geom_col), edges=_crs.get_edges(df, geom_col))
    _stamp_geo_footer(df.sparkSession, path, meta)


def _stamp_geo_footer(spark: SparkSession, path: str, geo_json: str) -> None:
    """Distributed footer stamp: each task rewrites one parquet file with
    the `geo` key merged into its schema metadata (pyarrow)."""
    import os
    names = [f for f in os.listdir(path)
             if f.endswith(".parquet") and not f.startswith(("_", "."))]
    file_paths = [os.path.join(path, f) for f in names]

    def stamp(p: str, geo=geo_json) -> None:
        import pyarrow.parquet as pq
        table = pq.read_table(p)
        md = dict(table.schema.metadata or {})
        md[b"geo"] = geo.encode("utf-8")
        pq.write_table(table.replace_schema_metadata(md), p + ".tmp")
        os.replace(p + ".tmp", p)
        # hadoop LocalFileSystem keeps .crc sidecars; stale ones fail reads
        crc = os.path.join(os.path.dirname(p),
                           "." + os.path.basename(p) + ".crc")
        if os.path.exists(crc):
            os.remove(crc)

    if len(file_paths) <= 1:
        for p in file_paths:
            stamp(p)
    else:
        (spark.sparkContext.parallelize(file_paths, len(file_paths))
         .foreach(stamp))


def geoparquet_metadata(path: str) -> dict | None:
    """Parse the `geo` footer of a GeoParquet dataset (first file wins)."""
    import json
    import os
    import pyarrow.parquet as pq
    if os.path.isdir(path):
        cands = sorted(f for f in os.listdir(path)
                       if f.endswith(".parquet") and not f.startswith(("_", ".")))
        if not cands:
            return None
        path = os.path.join(path, cands[0])
    md = pq.read_schema(path).metadata or {}
    raw = md.get(b"geo")
    return json.loads(raw) if raw else None


# accepted values mirror the reference's serde enums
# (rust/sedona-geoparquet/src/metadata.rs:285-380 GeoParquetColumnMetadata,
# GeoParquetColumnEncoding, GeometryTypeAndDimensionsSet)
_GP_ENCODINGS = {"WKB", "point", "linestring", "polygon", "multipoint",
                 "multilinestring", "multipolygon"}
_GP_GEOM_TYPES = {"Point", "LineString", "Polygon", "MultiPoint",
                  "MultiLineString", "MultiPolygon", "GeometryCollection"}
_GP_COVERING_KEYS = ("xmin", "ymin", "xmax", "ymax")


def parse_geoparquet_metadata_strict(geo) -> dict:
    """Validate a parsed `geo` footer against the reference's metadata
    schema (metadata.rs:285-380): required version/primary_column/columns,
    the 1.1 encoding enum, geometry_types values (with the `" Z"` 3-D
    suffix rule and uniqueness), planar|spherical edges,
    counterclockwise-only orientation, RFC-7946 bbox arity, and
    covering.bbox paths of the `[column, field]` shape.  Raises
    ValueError on any drift — the guard for the footer WE emit as much
    as for external files."""
    if not isinstance(geo, dict):
        raise ValueError("geo metadata must be a JSON object")
    for req in ("version", "primary_column", "columns"):
        if req not in geo:
            raise ValueError(f"geo metadata missing required {req!r}")
    if not isinstance(geo["version"], str) or not geo["version"]:
        raise ValueError("geo.version must be a non-empty string")
    cols = geo["columns"]
    if not isinstance(cols, dict) or not cols:
        raise ValueError("geo.columns must be a non-empty object")
    if geo["primary_column"] not in cols:
        raise ValueError(
            f"primary_column {geo['primary_column']!r} not in columns")
    for name, cm in cols.items():
        if not isinstance(cm, dict):
            raise ValueError(f"column {name!r} metadata must be an object")
        enc = cm.get("encoding")
        if enc not in _GP_ENCODINGS:
            raise ValueError(f"column {name!r}: unknown encoding {enc!r}")
        gts = cm.get("geometry_types", [])
        if not isinstance(gts, list):
            raise ValueError(f"column {name!r}: geometry_types not a list")
        seen = set()
        for gt in gts:
            base = gt[:-2] if isinstance(gt, str) and gt.endswith(" Z") \
                else gt
            if base not in _GP_GEOM_TYPES:
                raise ValueError(
                    f"column {name!r}: bad geometry type {gt!r}")
            if gt in seen:
                raise ValueError(
                    f"column {name!r}: duplicate geometry type {gt!r}")
            seen.add(gt)
        edges = cm.get("edges", "planar")
        if edges not in ("planar", "spherical"):
            raise ValueError(f"column {name!r}: bad edges {edges!r}")
        orient = cm.get("orientation")
        if orient is not None and orient != "counterclockwise":
            raise ValueError(
                f"column {name!r}: orientation must be counterclockwise")
        bbox = cm.get("bbox")
        if bbox is not None and (not isinstance(bbox, list)
                                 or len(bbox) not in (4, 6)
                                 or not all(isinstance(v, (int, float))
                                            for v in bbox)):
            raise ValueError(f"column {name!r}: bbox must be [xmin, ymin, "
                             f"xmax, ymax] (or 6 values with z)")
        epoch = cm.get("epoch")
        if epoch is not None and not isinstance(epoch, (int, float)):
            raise ValueError(f"column {name!r}: epoch must be a number")
        cov = cm.get("covering")
        if cov is not None:
            if not isinstance(cov, dict) or "bbox" not in cov:
                raise ValueError(f"column {name!r}: covering needs bbox")
            cb = cov["bbox"]
            if set(cb) != set(_GP_COVERING_KEYS):
                raise ValueError(
                    f"column {name!r}: covering.bbox needs exactly "
                    f"{_GP_COVERING_KEYS}")
            for k in _GP_COVERING_KEYS:
                p = cb[k]
                if (not isinstance(p, list) or len(p) != 2
                        or not all(isinstance(s, str) and s for s in p)):
                    raise ValueError(
                        f"column {name!r}: covering.bbox.{k} must be "
                        f"[column, field]")
    return geo


def read_geoparquet(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Read an (external or self-written) GeoParquet 1.1 dataset.

    Returns (DataFrame, geo metadata dict).  WKB is this engine's native
    geometry encoding, so the primary column is directly usable by every
    ST_ function; raises if the footer is missing or a non-WKB encoding is
    declared."""
    geo = geoparquet_metadata(path)
    if geo is None:
        raise ValueError(f"{path}: no `geo` footer metadata (not GeoParquet)")
    geo = parse_geoparquet_metadata_strict(geo)
    col = geo["primary_column"]
    colmeta = geo["columns"][col]
    enc = colmeta.get("encoding", "WKB")
    if enc.upper() != "WKB":
        raise ValueError(f"unsupported GeoParquet encoding {enc!r}")
    df = spark.read.parquet(path)
    # rehydrate the type-level CRS sidecar from the footer
    from sedona_db_spark import crs as _crs
    crs_obj = colmeta.get("crs")
    if isinstance(crs_obj, dict) and "id" in crs_obj:
        crs_str = f"{crs_obj['id'].get('authority', 'EPSG')}:" \
                  f"{crs_obj['id'].get('code')}"
    else:
        crs_str = _crs.DEFAULT_CRS
    df = _crs.with_crs(df, col, crs_str, colmeta.get("edges", "planar"))
    return df, geo


def covering_bbox_filter(geo: dict, qxmin: float, qymin: float,
                         qxmax: float, qymax: float) -> Column:
    """bbox-intersects predicate over the covering declared in the `geo`
    metadata (struct-field comparisons push down to the parquet scan)."""
    cov = geo["columns"][geo["primary_column"]]["covering"]["bbox"]
    c = {k: F.col(".".join(v)) for k, v in cov.items()}
    return ((c["xmin"] <= qxmax) & (c["xmax"] >= qxmin)
            & (c["ymin"] <= qymax) & (c["ymax"] >= qymin))
