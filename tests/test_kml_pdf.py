"""S7/S8 sinks: KML polygons (igh->WGS84 reprojection) and the PDF report."""

import numpy as np
import pytest

from drivers_of_global_deforestation_ray.functions.goode import igh_forward
from drivers_of_global_deforestation_ray.sources.kml import (read_kml_polygons,
                                                             write_kml_polygons)
from drivers_of_global_deforestation_ray.sources.pdf import write_text_pdf
from drivers_of_global_deforestation_ray.state.geo import make_region_polygons


def test_kml_roundtrip_wgs84(tmp_path):
    rings, ids = make_region_polygons(5, seed=3)
    p = str(tmp_path / "regions.kml")
    write_kml_polygons(p, rings, ids)
    back, names = read_kml_polygons(p)
    assert len(back) == 5
    assert names == [f"region-{i}" for i in ids]
    for orig, got in zip(rings, back):
        # writer closes the ring; drop the repeated closing vertex
        got = got[:-1] if (got[0] == got[-1]).all() and len(got) == len(orig) + 1 else got
        assert np.abs(got - orig).max() < 1e-8


def test_kml_reprojects_igh_to_wgs84(tmp_path):
    """Rings given in interrupted-Goode meters (the reference's CRS,
    Supplemental_Data_1.R:884-912) must come back as the WGS84 lat/lon they
    project from — spTransform+writeOGR parity."""
    lat = np.array([10.0, 12.0, 14.0, 10.0])
    lon = np.array([20.0, 24.0, 20.0, 18.0])
    x, y = igh_forward(lat, lon)
    ring_m = np.stack([x, y], axis=1)
    p = str(tmp_path / "igh.kml")
    write_kml_polygons(p, [ring_m], np.array([1]), crs="igh")
    back, _ = read_kml_polygons(p)
    got = back[0][:-1]  # drop closing vertex
    assert np.abs(got[:, 0] - lon).max() < 1e-6
    assert np.abs(got[:, 1] - lat).max() < 1e-6


def test_pdf_report_structure(tmp_path):
    p = str(tmp_path / "trees.pdf")
    pages = [("tree region=1 driver=2", ["node 0: split f3 < 0.5", "  leaf: 0.82"]),
             ("tree region=2 driver=1", ["node 0: leaf 0.10 (n=42)"])]
    write_text_pdf(p, pages)
    raw = open(p, "rb").read()
    assert raw.startswith(b"%PDF-1.4")
    assert raw.rstrip().endswith(b"%%EOF")
    assert b"/Type /Catalog" in raw and b"/Count 2" in raw
    assert b"tree region=1 driver=2" in raw  # uncompressed streams: greppable
    assert b"leaf: 0.82" in raw
    # xref offsets actually point at their objects
    import re

    xref_pos = int(raw.rsplit(b"startxref", 1)[1].split()[0])
    assert raw[xref_pos:xref_pos + 4] == b"xref"
    m = re.findall(rb"(\d{10}) 00000 n", raw)
    for i, off in enumerate(m, start=1):
        assert raw[int(off):int(off) + len(f"{i} 0 obj")] == f"{i} 0 obj".encode()


def test_pdf_escapes_parens(tmp_path):
    p = str(tmp_path / "esc.pdf")
    write_text_pdf(p, [("t(x)", [r"a (weird) \line"])])
    raw = open(p, "rb").read()
    assert rb"\(weird\)" in raw


def test_export_tree_report_real_trees(tmp_path, ray_session):
    """End-to-end S7: fit the miniworld (region x driver) trees, export all
    of them to one PDF, verify structure and per-tree pages."""
    from drivers_of_global_deforestation_ray.pipelines.flagship import (
        FlagshipConfig, build_training_table)
    from drivers_of_global_deforestation_ray.sources.miniworld import build_miniworld
    from drivers_of_global_deforestation_ray.stages.score import (
        export_tree_report, fit_region_trees)

    build_miniworld("/tmp/graft_miniworld")
    cfg = FlagshipConfig(world_dir="/tmp/graft_miniworld")
    tr = build_training_table(cfg.world_dir, cfg.grid, cfg.res, cfg.feature_names)
    trees, _imp = fit_region_trees(tr, cfg.feature_names,
                                   regions=list(range(1, cfg.num_regions + 1)))
    p = str(tmp_path / "trees.pdf")
    export_tree_report(trees, cfg.feature_names, p)
    raw = open(p, "rb").read()
    assert raw.startswith(b"%PDF-1.4")
    assert f"/Count {len(trees)}".encode() in raw
    assert b"CART region=1 driver=1" in raw
    assert b"leaf value=" in raw


def test_hex_boundary_kml_roundtrip(tmp_path):
    """S8 x hexgrid: export hex cell boundaries as KML polygons, read them
    back, and verify each ring's vertices re-encode to its own cell."""
    import numpy as np

    from drivers_of_global_deforestation_ray.functions import hexgrid as hg
    from drivers_of_global_deforestation_ray.sources.kml import (
        read_kml_polygons, write_kml_polygons)

    ids = hg.latlng_to_hex(np.array([12.0, 13.0, -25.0]), np.array([15.0, 16.0, 40.0]), 5)
    lat, lon = hg.hex_boundary(ids)
    rings = [np.stack([lon[i], lat[i]], axis=1) for i in range(len(ids))]
    path = str(tmp_path / "cells.kml")
    write_kml_polygons(path, rings, np.arange(1, len(ids) + 1),
                       names=[t for t in hg.hex_token(ids)])
    back, names = read_kml_polygons(path)
    assert len(back) == len(ids) and names == list(hg.hex_token(ids))
    for ring, hid in zip(back, ids):
        got = np.asarray(ring)[:-1]  # drop the closing vertex
        assert got.shape == (6, 2)
        # the ring centroid lies in the cell it was exported from
        clon, clat = got[:, 0].mean(), got[:, 1].mean()
        assert hg.latlng_to_hex(np.array([clat]), np.array([clon]), 5)[0] == hid
        # 9-decimal KML coordinates roundtrip to ~1e-9 deg
        wlat, wlon = hg.hex_boundary(np.array([hid]))
        assert np.abs(got[:, 1] - wlat[0]).max() < 1e-8
        assert np.abs(got[:, 0] - wlon[0]).max() < 1e-8
