"""Grid cell scheme tests, including SQL-expression parity with numpy."""

import duckdb
import numpy as np

from sedona_db_spark import grid


def test_pack_unpack():
    for res in (0, 4, 10, 28):
        c = grid.cell_id(10.0, 20.0, res)
        r, ix, iy = grid.unpack(c)
        assert r == res
        bb = grid.cell_bbox(c)
        assert bb[0] <= 10.0 <= bb[2] and bb[1] <= 20.0 <= bb[3]


def test_cells_unique_per_res():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    c6 = grid.cell_ids(lon, lat, 6)
    c7 = grid.cell_ids(lon, lat, 7)
    assert len(set(c6.tolist()) & set(c7.tolist())) == 0  # res disjoint


def test_covering():
    cov = grid.covering_cells(-1, -1, 1, 1, 6)
    assert grid.cell_id(0.5, 0.5, 6) in cov
    assert grid.cell_id(5.0, 5.0, 6) not in cov
    # covering cells tile the bbox
    for c in cov:
        bb = grid.cell_bbox(int(c))
        assert bb[2] >= -1 and bb[0] <= 1 and bb[3] >= -1 and bb[1] <= 1


def test_pick_covering_res_bounds():
    res = grid.pick_covering_res(0, 0, 10, 10, max_cells=64)
    assert len(grid.covering_cells(0, 0, 10, 10, res)) <= 64
    assert len(grid.covering_cells(0, 0, 10, 10, res + 1)) > 64 or res == grid.MAX_RES


def test_ring_cells():
    c = grid.cell_id(0.0, 0.0, 6)
    assert len(grid.ring_cells(c, 0)) == 1
    assert len(grid.ring_cells(c, 1)) == 8
    assert len(grid.ring_cells(c, 2)) == 16
    # poles clamp: top row cell has fewer ring neighbors
    top = grid.cell_id(0.0, 89.9, 3)
    assert len(grid.ring_cells(top, 1)) == 5


def test_sql_expr_matches_numpy():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    expected = grid.cell_ids(lon, lat, 5)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
    sql = grid.cell_expr_sql("lon", "lat", 5)
    got = con.sql(f"SELECT {sql} AS cell FROM pts").df()["cell"].to_numpy()
    np.testing.assert_array_equal(expected, got)


def test_hilbert_curve_properties():
    """sd_order's Hilbert key: bijective and unit-step adjacent (every
    consecutive curve position is a grid neighbor — the locality property
    row-major cell ids lack)."""
    import numpy as np
    from sedona_db_spark.grid import hilbert_d, hilbert_ids
    n = 32
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_d(xs.ravel(), ys.ravel(), 5)
    assert sorted(d.tolist()) == list(range(n * n))
    pos = {int(v): (int(x), int(y))
           for v, x, y in zip(d, xs.ravel(), ys.ravel())}
    assert all(abs(pos[i][0] - pos[i + 1][0])
               + abs(pos[i][1] - pos[i + 1][1]) == 1
               for i in range(n * n - 1))
    # lon/lat wrapper quantizes like cell_ids
    k = hilbert_ids(np.array([0.0]), np.array([0.0]), 15)
    assert 0 <= int(k[0]) < (1 << 30)
