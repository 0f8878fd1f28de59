"""Pure-numpy WKB / WKT codec.

The engine stores every geometry as WKB bytes in a BinaryType column — the
same storage decision as the reference (SedonaType::Wkb over Arrow Binary,
/root/reference/rust/sedona-schema/src/datatypes.rs:181-188: "every kernel
parses WKB").  This module is the analogue of the reference's WKB parsing
layer (/root/reference/rust/sedona-geometry/src/), re-implemented from the
public WKB/EWKB spec with numpy:

- the POINT hot path is fully vectorized: a batch of N little-endian 2-D
  point WKBs is one (N, 21) uint8 view → two float64 columns, zero per-row
  Python.  Points are the 100 TB-scale side (web pages geocoded to points);
  polygons/lines are dimension-table-sized and may take the per-row parse.
- the general decoder handles Point/LineString/Polygon/MultiPoint/
  MultiLineString/MultiPolygon/GeometryCollection, both endians, ISO
  (type+1000/2000/3000) and EWKB (0x80000000/0x40000000 flags + optional
  SRID) Z/M variants.

Decoded form ("geom tuple"): (type_name, payload)
  Point              -> ("Point", ndarray shape (ndim,))  (empty: NaNs)
  LineString         -> ("LineString", ndarray (n, ndim))
  Polygon            -> ("Polygon", [ring ndarray (n, ndim), ...])
  MultiPoint         -> ("MultiPoint", ndarray (n, ndim))
  MultiLineString    -> ("MultiLineString", [ndarray, ...])
  MultiPolygon       -> ("MultiPolygon", [[ring, ...], ...])
  GeometryCollection -> ("GeometryCollection", [geom tuple, ...])
"""

from __future__ import annotations

import struct

import numpy as np

# ISO geometry type codes
POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION = 4, 5, 6, 7

TYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}
TYPE_CODES = {v: k for k, v in TYPE_NAMES.items()}

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000

POINT_WKB_SIZE = 21  # 1 (endian) + 4 (type) + 16 (x, y)


# ---------------------------------------------------------------------------
# Vectorized point fast path
# ---------------------------------------------------------------------------

def points_to_wkb(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Encode N (x, y) pairs as N little-endian WKB points. Vectorized."""
    n = len(x)
    buf = np.empty((n, POINT_WKB_SIZE), dtype=np.uint8)
    buf[:, 0] = 1  # little endian
    buf[:, 1:5] = np.frombuffer(struct.pack("<I", POINT), dtype=np.uint8)
    buf[:, 5:13] = np.asarray(x, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.asarray(y, dtype="<f8").view(np.uint8).reshape(n, 8)
    raw = buf.tobytes()
    return np.fromiter(
        (raw[i * POINT_WKB_SIZE:(i + 1) * POINT_WKB_SIZE] for i in range(n)),
        dtype=object,
        count=n,
    )


def wkb_to_points(wkbs) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch of WKB values to (x, y) float64 arrays.

    Fully vectorized when every non-null value is a 21-byte little-endian
    2-D point (the hot path); falls back to the general decoder per row
    otherwise.  Nulls/non-points decode to NaN.
    """
    vals = list(wkbs)
    n = len(vals)
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    fast = all(
        v is not None and len(v) == POINT_WKB_SIZE and v[0] == 1 for v in vals
    )
    if fast and n:
        flat = np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(n, POINT_WKB_SIZE)
        x[:] = flat[:, 5:13].copy().view("<f8").ravel()
        y[:] = flat[:, 13:21].copy().view("<f8").ravel()
        return x, y
    for i, v in enumerate(vals):
        if v is None:
            continue
        g = decode(v)
        if g is not None and g[0] == "Point" and len(g[1]) >= 2:
            x[i], y[i] = g[1][0], g[1][1]
    return x, y


# ---------------------------------------------------------------------------
# General decoder
# ---------------------------------------------------------------------------

def _read_header(buf: bytes, off: int):
    """Return (iso_type, ndim, has_z, has_m, new_off, endian_char)."""
    bo = "<" if buf[off] == 1 else ">"
    (raw,) = struct.unpack_from(bo + "I", buf, off + 1)
    off += 5
    has_z = has_m = False
    if raw & (_EWKB_Z | _EWKB_M | _EWKB_SRID):  # EWKB flag style
        has_z = bool(raw & _EWKB_Z)
        has_m = bool(raw & _EWKB_M)
        if raw & _EWKB_SRID:
            off += 4  # skip srid
        base = raw & 0x0FFFFFFF
        if base >= 1000:  # hybrid: ISO dim code under an EWKB SRID flag
            k = base // 1000
            has_z = has_z or k in (1, 3)
            has_m = has_m or k in (2, 3)
            base %= 1000
    else:  # ISO style: 1000 → Z, 2000 → M, 3000 → ZM
        base = raw % 1000
        k = raw // 1000
        has_z = k in (1, 3)
        has_m = k in (2, 3)
    ndim = 2 + has_z + has_m
    return base, ndim, has_z, has_m, off, bo


def _read_coords(buf: bytes, off: int, n: int, ndim: int, bo: str):
    arr = np.frombuffer(buf, dtype=bo + "f8", count=n * ndim, offset=off)
    return arr.reshape(n, ndim).astype(np.float64, copy=True), off + 8 * n * ndim


def _decode_at(buf: bytes, off: int):
    base, ndim, _, _, off, bo = _read_header(buf, off)
    if base == POINT:
        coords, off = _read_coords(buf, off, 1, ndim, bo)
        return ("Point", coords[0]), off
    if base == LINESTRING:
        (n,) = struct.unpack_from(bo + "I", buf, off)
        coords, off = _read_coords(buf, off + 4, n, ndim, bo)
        return ("LineString", coords), off
    if base == POLYGON:
        (nr,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", buf, off)
            ring, off = _read_coords(buf, off + 4, n, ndim, bo)
            rings.append(ring)
        return ("Polygon", rings), off
    if base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        (ng,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        parts = []
        for _ in range(ng):
            g, off = _decode_at(buf, off)
            parts.append(g)
        if base == MULTIPOINT:
            pts = [g[1] for g in parts]
            arr = np.vstack(pts) if pts else np.empty((0, ndim))
            return ("MultiPoint", arr), off
        if base == MULTILINESTRING:
            return ("MultiLineString", [g[1] for g in parts]), off
        if base == MULTIPOLYGON:
            return ("MultiPolygon", [g[1] for g in parts]), off
        return ("GeometryCollection", parts), off
    raise ValueError(f"unsupported WKB geometry type code {base}")


def decode(buf: bytes | None):
    """Decode one WKB value to a geom tuple (None stays None)."""
    if buf is None:
        return None
    g, _ = _decode_at(bytes(buf), 0)
    return g


# ---------------------------------------------------------------------------
# Encoder (little-endian ISO WKB, 2-D unless coords carry more dims)
# ---------------------------------------------------------------------------

def _type_code(name: str, ndim: int, m_flag: bool = False) -> int:
    code = TYPE_CODES[name]
    if ndim == 3:
        code += 2000 if m_flag else 1000  # ISO: 1000=Z, 2000=M
    elif ndim == 4:
        code += 3000
    return code


def _geom_ndim(g) -> int:
    name, payload = g
    if name == "Point":
        return len(payload)
    if name in ("LineString", "MultiPoint"):
        arr = np.asarray(payload)
        # an EMPTY with a Z/M token is a (0, ndim) array — the flag must
        # survive encoding (reference: ST_HasZ('LINESTRING Z EMPTY') = true)
        return arr.shape[1] if arr.ndim == 2 and arr.shape[1] >= 2 else 2
    if name == "Polygon":
        return payload[0].shape[1] if payload else 2
    if name == "MultiLineString":
        return payload[0].shape[1] if payload else 2
    if name == "MultiPolygon":
        return payload[0][0].shape[1] if payload and payload[0] else 2
    if name == "GeometryCollection":
        return _geom_ndim(payload[0]) if payload else 2
    return 2


def _first_flag(m_flag) -> bool:
    """Header flag for a (possibly nested per-part) m_flag value."""
    while isinstance(m_flag, (list, tuple)):
        if not m_flag:
            return False
        m_flag = m_flag[0]
    return bool(m_flag)


def encode(g, m_flag=False) -> bytes | None:
    """Encode a geom tuple as little-endian ISO WKB.

    ``m_flag``: mark a 3rd coordinate dimension as M instead of Z
    (ISO type + 2000) — used by ST_Force3DM.  For a GeometryCollection it
    may be a nested list (one entry per part, as produced by the WKT
    parser) so collections mixing M/Z parts keep per-part dimension flags."""
    if g is None:
        return None
    name, payload = g
    ndim = _geom_ndim(g)
    out = [b"\x01", struct.pack("<I", _type_code(name, ndim, _first_flag(m_flag)))]
    if name == "Point":
        c = np.asarray(payload, dtype="<f8")
        out.append(c.tobytes())
    elif name in ("LineString", "MultiPoint"):
        arr = np.asarray(payload, dtype="<f8").reshape(-1, ndim)
        if name == "MultiPoint":
            out = [b"\x01", struct.pack("<II",
                                        _type_code(name, ndim, _first_flag(m_flag)),
                                        len(arr))]
            for row in arr:
                out.append(encode(("Point", row), _first_flag(m_flag)))
        else:
            out.append(struct.pack("<I", len(arr)))
            out.append(arr.tobytes())
    elif name == "Polygon":
        out.append(struct.pack("<I", len(payload)))
        for ring in payload:
            arr = np.asarray(ring, dtype="<f8").reshape(-1, ndim)
            out.append(struct.pack("<I", len(arr)))
            out.append(arr.tobytes())
    elif name == "MultiLineString":
        out.append(struct.pack("<I", len(payload)))
        for line in payload:
            out.append(encode(("LineString", line), m_flag))
    elif name == "MultiPolygon":
        out.append(struct.pack("<I", len(payload)))
        for rings in payload:
            out.append(encode(("Polygon", rings), m_flag))
    elif name == "GeometryCollection":
        out.append(struct.pack("<I", len(payload)))
        flags = (list(m_flag) if isinstance(m_flag, (list, tuple))
                 else [m_flag] * len(payload))
        if len(flags) < len(payload):
            flags += [False] * (len(payload) - len(flags))
        for part, fl in zip(payload, flags):
            out.append(encode(part, fl))
    else:
        raise ValueError(f"unsupported geometry {name}")
    return b"".join(out)


# ---------------------------------------------------------------------------
# WKT (parser + writer) — used by ST_GeomFromText / ST_AsText and tests
# ---------------------------------------------------------------------------

def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _coords_wkt(arr) -> str:
    arr = np.asarray(arr).reshape(-1, np.asarray(arr).shape[-1])
    return ", ".join(" ".join(_fmt_num(c) for c in row) for row in arr)


def to_wkt(g) -> str | None:
    if g is None:
        return None
    name, payload = g
    up = name.upper()
    if name == "Point":
        if np.any(np.isnan(payload)):
            return "POINT EMPTY"
        return f"POINT ({' '.join(_fmt_num(c) for c in payload)})"
    if name in ("LineString", "MultiPoint"):
        if len(payload) == 0:
            return f"{up} EMPTY"
        if name == "MultiPoint":
            inner = ", ".join(
                "(" + " ".join(_fmt_num(c) for c in row) + ")" for row in payload
            )
            return f"MULTIPOINT ({inner})"
        return f"LINESTRING ({_coords_wkt(payload)})"
    if name == "Polygon":
        if not payload:
            return "POLYGON EMPTY"
        inner = ", ".join(f"({_coords_wkt(r)})" for r in payload)
        return f"POLYGON ({inner})"
    if name == "MultiLineString":
        if not payload:
            return "MULTILINESTRING EMPTY"
        inner = ", ".join(f"({_coords_wkt(l)})" for l in payload)
        return f"MULTILINESTRING ({inner})"
    if name == "MultiPolygon":
        if not payload:
            return "MULTIPOLYGON EMPTY"
        polys = []
        for rings in payload:
            polys.append("(" + ", ".join(f"({_coords_wkt(r)})" for r in rings) + ")")
        return f"MULTIPOLYGON ({', '.join(polys)})"
    if name == "GeometryCollection":
        if not payload:
            return "GEOMETRYCOLLECTION EMPTY"
        return f"GEOMETRYCOLLECTION ({', '.join(to_wkt(p) for p in payload)})"
    raise ValueError(name)


class _WktParser:
    def __init__(self, text: str):
        self.s = text
        self.i = 0

    def _skip_ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t\n\r":
            self.i += 1

    def _word(self) -> str:
        self._skip_ws()
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] == "_"):
            j += 1
        w = self.s[self.i:j]
        self.i = j
        return w

    def _peek(self) -> str:
        self._skip_ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def _expect(self, ch: str):
        self._skip_ws()
        if self.i >= len(self.s) or self.s[self.i] != ch:
            raise ValueError(f"WKT parse error at {self.i} in {self.s!r}: expected {ch}")
        self.i += 1

    def _number(self) -> float:
        self._skip_ws()
        j = self.i
        while j < len(self.s) and self.s[j] not in " ,()\t\n\r":
            j += 1
        v = float(self.s[self.i:j])
        self.i = j
        return v

    def _coord(self, ndim_hint=None):
        pt = [self._number(), self._number()]
        while self._peek() not in ",)" and self._peek() != "":
            pt.append(self._number())
        return pt

    def _coord_seq(self):
        self._expect("(")
        rows = [self._coord()]
        while self._peek() == ",":
            self._expect(",")
            rows.append(self._coord())
        self._expect(")")
        width = max(len(r) for r in rows)
        return np.array([r + [0.0] * (width - len(r)) for r in rows], dtype=np.float64)

    def parse(self):
        g, m = self.parse_with_flags()
        # back-compat attr: True iff any part is M-only
        self.m_only = any(self._flat(m)) if isinstance(m, list) else bool(m)
        self.m_tree = m
        return g

    @staticmethod
    def _flat(m):
        for v in m:
            if isinstance(v, list):
                yield from _WktParser._flat(v)
            else:
                yield v

    def parse_with_flags(self):
        """Parse one geometry; returns (geom, m_flags) where m_flags is a
        bool for leaf/multi geometries and a nested list for collections —
        each part keeps its OWN M-only flag (a GC can mix M/Z/2-D parts,
        so a single parser-level flag is lossy)."""
        tag = self._word().upper()
        # optional Z / M / ZM token
        save = self.i
        mod = self._word().upper()
        if mod not in ("Z", "M", "ZM"):
            self.i = save
            mod = ""
        m_only = mod == "M"
        self._skip_ws()
        if self.s[self.i:self.i + 5].upper() == "EMPTY":
            self.i += 5
            return _empty_for(tag, 2 + len(mod)), m_only
        if tag == "POINT":
            self._expect("(")
            pt = self._coord()
            self._expect(")")
            return ("Point", np.array(pt, dtype=np.float64)), m_only
        if tag == "LINESTRING":
            return ("LineString", self._coord_seq()), m_only
        if tag == "POLYGON":
            self._expect("(")
            rings = [self._coord_seq()]
            while self._peek() == ",":
                self._expect(",")
                rings.append(self._coord_seq())
            self._expect(")")
            return ("Polygon", rings), m_only
        if tag == "MULTIPOINT":
            self._expect("(")
            pts = []
            while True:
                if self._peek() == "(":
                    self._expect("(")
                    pts.append(self._coord())
                    self._expect(")")
                else:
                    pts.append(self._coord())
                if self._peek() == ",":
                    self._expect(",")
                else:
                    break
            self._expect(")")
            width = max(len(p) for p in pts)
            arr = np.array([p + [0.0] * (width - len(p)) for p in pts])
            return ("MultiPoint", arr), m_only
        if tag == "MULTILINESTRING":
            self._expect("(")
            lines = [self._coord_seq()]
            while self._peek() == ",":
                self._expect(",")
                lines.append(self._coord_seq())
            self._expect(")")
            return ("MultiLineString", lines), m_only
        if tag == "MULTIPOLYGON":
            self._expect("(")
            polys = []
            while True:
                self._expect("(")
                rings = [self._coord_seq()]
                while self._peek() == ",":
                    self._expect(",")
                    rings.append(self._coord_seq())
                self._expect(")")
                polys.append(rings)
                if self._peek() == ",":
                    self._expect(",")
                else:
                    break
            self._expect(")")
            return ("MultiPolygon", polys), m_only
        if tag == "GEOMETRYCOLLECTION":
            self._expect("(")
            p0, f0 = self.parse_with_flags()
            parts, flags = [p0], [f0]
            while self._peek() == ",":
                self._expect(",")
                p, f = self.parse_with_flags()
                parts.append(p)
                flags.append(f)
            self._expect(")")
            return ("GeometryCollection", parts), flags
        raise ValueError(f"unknown WKT tag {tag!r}")


def _empty_for(tag: str, ndim: int = 2):
    """Empty geometry for a WKT tag; ``ndim`` carries the Z/M token's
    dimension so 'POINT Z EMPTY' keeps its flag through the WKB header."""
    t = tag.capitalize()
    fixes = {"Multipoint": "MultiPoint", "Multilinestring": "MultiLineString",
             "Multipolygon": "MultiPolygon", "Geometrycollection": "GeometryCollection",
             "Linestring": "LineString"}
    t = fixes.get(t, t)
    if t == "Point":
        return ("Point", np.full(ndim, np.nan))
    if t in ("LineString", "MultiPoint"):
        return (t, np.empty((0, ndim)))
    return (t, [])


def from_wkt(text: str | None):
    """Parse a WKT (or EWKT ``SRID=n;...``) string to a geom tuple."""
    if text is None:
        return None
    text = text.strip()
    if text.upper().startswith("SRID="):
        text = text.split(";", 1)[1]
    return _WktParser(text).parse()


def wkt_to_wkb(text: str | None) -> bytes | None:
    """WKT → WKB, preserving an M-only dimension token (type + 2000)."""
    if text is None:
        return None
    text = text.strip()
    srid = 0
    if text.upper().startswith("SRID="):
        head, text = text.split(";", 1)
        srid = int(head[5:])
    p = _WktParser(text)
    g = p.parse()
    # m_tree carries per-part M flags for collections (nested list shape
    # mirroring the GC parts); leaf/multi geometries get a single bool
    out = encode(g, m_flag=getattr(p, "m_tree", getattr(p, "m_only", False)))
    return set_srid(out, srid) if srid else out


def _wkt_at(buf: bytes, off: int) -> tuple[str | None, int]:
    """Render the WKB value at ``off`` as WKT, reading the dimension token
    (Z / M / ZM) from EACH sub-geometry's own header — a collection can mix
    M/Z/2-D parts, so stamping only the top-level token is lossy."""
    base, _, has_z, has_m, body_off, bo = _read_header(buf, off)
    g, new_off = _decode_at(buf, off)
    token = ("ZM" if has_z and has_m else
             "Z" if has_z else "M" if has_m else "")
    if base == GEOMETRYCOLLECTION and g[1]:
        (ng,) = struct.unpack_from(bo + "I", buf, body_off)
        part_off = body_off + 4
        inner = []
        for _ in range(ng):
            txt_p, part_off = _wkt_at(buf, part_off)
            inner.append(txt_p)
        tok = f" {token}" if token else ""
        return f"GEOMETRYCOLLECTION{tok} ({', '.join(inner)})", new_off
    txt = to_wkt(g)
    if txt is not None and token:
        if txt.endswith("EMPTY"):
            txt = f"{txt[:-len('EMPTY')].rstrip()} {token} EMPTY"
        else:
            head, rest = txt.split(" ", 1)
            txt = f"{head} {token} {rest}"
    return txt, new_off


def wkb_to_wkt(buf: bytes | None) -> str | None:
    """WKB → WKT with the reference's dimension token (POINT Z (…) /
    POINT M (…) / POINT ZM (…)), read from the header flags — per part for
    collections."""
    if buf is None:
        return None
    return _wkt_at(bytes(buf), 0)[0]


# ---------------------------------------------------------------------------
# SRID handling + EWKB interop (PostGIS/GEOS "extended" flavor)
# ---------------------------------------------------------------------------

def _parse_type(raw_code: int):
    """(base, has_z, has_m, has_srid) for an ISO, EWKB-flagged, or hybrid
    (ISO dim code | EWKB SRID flag) type code."""
    has_z = bool(raw_code & _EWKB_Z)
    has_m = bool(raw_code & _EWKB_M)
    has_s = bool(raw_code & _EWKB_SRID)
    base = raw_code & 0x0FFFFFFF
    if base >= 1000:
        k = base // 1000
        has_z = has_z or k in (1, 3)
        has_m = has_m or k in (2, 3)
        base %= 1000
    return base, has_z, has_m, has_s


def get_srid(raw: bytes) -> int:
    """Embedded top-level SRID (0 when none)."""
    buf = bytes(raw)
    bo = "<" if buf[0] == 1 else ">"
    (code,) = struct.unpack_from(bo + "I", buf, 1)
    if code & _EWKB_SRID:
        (s,) = struct.unpack_from(bo + "I", buf, 5)
        return int(s)
    return 0


def set_srid(raw: bytes, srid: int) -> bytes:
    """WKB with the top-level SRID replaced, PRESERVING Z/M dimensions
    (internal form: ISO dim code | EWKB SRID flag).  srid=0 strips the
    SRID header entirely (PostGIS ST_SetSRID(g, 0) semantics)."""
    buf = bytes(raw)
    bo = "<" if buf[0] == 1 else ">"
    (code,) = struct.unpack_from(bo + "I", buf, 1)
    base, has_z, has_m, has_s = _parse_type(code)
    body = buf[9:] if has_s else buf[5:]
    iso = base + 1000 * ((1 if has_z else 0) + (2 if has_m else 0))
    s = int(srid)
    if s == 0:
        return buf[:1] + struct.pack(bo + "I", iso) + body
    return (buf[:1] + struct.pack(bo + "I", iso | _EWKB_SRID)
            + struct.pack(bo + "I", s) + body)


def _to_ewkb_at(buf: bytes, off: int, out: bytearray, srid: int,
                top: bool, iso: bool = False) -> int:
    bo = "<" if buf[off] == 1 else ">"
    (code,) = struct.unpack_from(bo + "I", buf, off + 1)
    base, has_z, has_m, has_s = _parse_type(code)
    pos = off + 5 + (4 if has_s else 0)
    ndim = 2 + has_z + has_m
    if iso:
        ocode = base + 1000 * ((1 if has_z else 0) + (2 if has_m else 0))
    else:
        ocode = base
        if has_z:
            ocode |= _EWKB_Z
        if has_m:
            ocode |= _EWKB_M
    out.append(1)
    if top and srid:
        out += struct.pack("<I", ocode | _EWKB_SRID)
        out += struct.pack("<I", srid)
    else:
        out += struct.pack("<I", ocode)
    if base == POINT:
        vals = struct.unpack_from(bo + "d" * ndim, buf, pos)
        pos += 8 * ndim
        out += struct.pack("<" + "d" * ndim, *vals)
    elif base == LINESTRING:
        (n,) = struct.unpack_from(bo + "I", buf, pos)
        pos += 4
        out += struct.pack("<I", n)
        k = n * ndim
        vals = struct.unpack_from(bo + "d" * k, buf, pos)
        pos += 8 * k
        out += struct.pack("<" + "d" * k, *vals)
    elif base == POLYGON:
        (nr,) = struct.unpack_from(bo + "I", buf, pos)
        pos += 4
        out += struct.pack("<I", nr)
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", buf, pos)
            pos += 4
            out += struct.pack("<I", n)
            k = n * ndim
            vals = struct.unpack_from(bo + "d" * k, buf, pos)
            pos += 8 * k
            out += struct.pack("<" + "d" * k, *vals)
    elif base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON,
                  GEOMETRYCOLLECTION):
        (n,) = struct.unpack_from(bo + "I", buf, pos)
        pos += 4
        out += struct.pack("<I", n)
        for _ in range(n):
            # SRID is emitted at the top level only (PostGIS EWKB; GEOS
            # WKBWriter flavor=extended, reference functions/test_wkb.py)
            pos = _to_ewkb_at(buf, pos, out, 0, False, iso)
    else:
        raise ValueError(f"unsupported WKB geometry type code {code}")
    return pos


def to_ewkb(raw: bytes | None, srid: int | None = None) -> bytes | None:
    """PostGIS/GEOS extended-flavor WKB: Z/M as high-bit flags, SRID
    embedded at the top level only when nonzero.  ``srid=None`` uses the
    input's embedded SRID."""
    if raw is None:
        return None
    buf = bytes(raw)
    s = get_srid(buf) if srid is None else int(srid)
    out = bytearray()
    _to_ewkb_at(buf, 0, out, s, True)
    return bytes(out)


def to_iso(raw: bytes | None) -> bytes | None:
    """Canonical internal form: little-endian ISO dimension codes, the
    top-level SRID (if any) kept as the ISO-code|SRID-flag hybrid.  Walks
    (and thereby validates) the whole value."""
    if raw is None:
        return None
    buf = bytes(raw)
    out = bytearray()
    _to_ewkb_at(buf, 0, out, get_srid(buf), True, iso=True)
    return bytes(out)
