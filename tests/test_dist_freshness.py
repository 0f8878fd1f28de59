"""Deployment-artifact freshness gate (round-7 VERDICT #3): the round-6
review found ``dist/sedona_db_spark.zip`` silently carrying round-5 code
(missing sql_frontend.py / winding_batch.py, stale media.py/buffer.py) —
anyone following the README's ``spark-submit --py-files`` path got old
code.  This test pins the zip's namelist AND per-file bytes against the
live package tree so the artifact can never drift again: rebuild with
``python tools/package.py`` after editing the package."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(ROOT, "dist", "sedona_db_spark.zip")


def _tree_files() -> dict[str, int]:
    out = {}
    pkg = os.path.join(ROOT, "sedona_db_spark")
    for dirpath, _dirnames, filenames in os.walk(pkg):
        if "__pycache__" in dirpath:
            continue
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                out[os.path.relpath(full, ROOT)] = os.path.getsize(full)
    return out


def test_zip_exists():
    assert os.path.exists(ZIP), \
        "dist/sedona_db_spark.zip missing — run python tools/package.py"


def test_zip_namelist_matches_tree():
    tree = _tree_files()
    with zipfile.ZipFile(ZIP) as z:
        zipped = {i.filename: i.file_size for i in z.infolist()}
    missing = sorted(set(tree) - set(zipped))
    extra = sorted(set(zipped) - set(tree))
    assert not missing and not extra, \
        f"zip drifted: missing={missing} extra={extra} — rerun tools/package.py"


def test_zip_bytes_match_tree():
    # byte-identical, not just same size: a same-length edit must fail too
    with zipfile.ZipFile(ZIP) as z:
        for name in z.namelist():
            with open(os.path.join(ROOT, name), "rb") as f:
                assert z.read(name) == f.read(), \
                    f"{name} stale in dist zip — rerun tools/package.py"
