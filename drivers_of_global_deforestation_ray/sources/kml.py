"""KML vector sink + igh->WGS84 reprojection (SURVEY.md S8 de-stub).

The reference's legacy export path reprojects the region boundary layer from
interrupted Goode homolosine meters to WGS84 and writes KML
(``spTransform`` + ``writeOGR``, ``Supplemental_Data_1.R:884-912``,
commented legacy).  With :func:`..functions.goode.igh_inverse` the engine
owns both halves: polygon rings in igh meters reproject exactly, and the
KML document is plain XML built with stdlib ElementTree — no OGR needed.

KML is WGS84 lon,lat by definition, so ``crs="igh"`` inputs reproject and
``crs="wgs84"`` inputs pass through.  A reader exists for roundtrip tests
(and for ingesting region layers someone else exported).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["write_kml_polygons", "read_kml_polygons"]

_KML_NS = "http://www.opengis.net/kml/2.2"


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not (ring[0] == ring[-1]).all():
        return np.vstack([ring, ring[:1]])
    return ring


def write_kml_polygons(
    path: str,
    rings: "list[np.ndarray]",
    region_ids: np.ndarray,
    names: "list[str] | None" = None,
    crs: str = "wgs84",
) -> None:
    """Write polygons as KML Placemarks.  ``rings``: list of (N, 2) arrays —
    (lon, lat) degrees for ``crs='wgs84'`` or (x, y) interrupted-Goode meters
    for ``crs='igh'`` (reprojected through the exact igh inverse).  Rings are
    closed automatically; coordinates carry 9 decimals (~0.1 mm)."""
    if crs not in ("wgs84", "igh"):
        raise ValueError(f"crs must be wgs84/igh, got {crs!r}")
    ET.register_namespace("", _KML_NS)
    kml = ET.Element(f"{{{_KML_NS}}}kml")
    doc = ET.SubElement(kml, f"{{{_KML_NS}}}Document")
    for i, ring in enumerate(rings):
        ring = np.asarray(ring, dtype=np.float64)
        if crs == "igh":
            lat, lon = __import__(
                "drivers_of_global_deforestation_ray.functions.goode", fromlist=["igh_inverse"]
            ).igh_inverse(ring[:, 0], ring[:, 1])
            ring = np.stack([lon, lat], axis=1)
        ring = _close_ring(ring)
        pm = ET.SubElement(doc, f"{{{_KML_NS}}}Placemark")
        name = ET.SubElement(pm, f"{{{_KML_NS}}}name")
        name.text = (names[i] if names is not None
                     else f"region-{int(np.asarray(region_ids)[i])}")
        poly = ET.SubElement(pm, f"{{{_KML_NS}}}Polygon")
        outer = ET.SubElement(poly, f"{{{_KML_NS}}}outerBoundaryIs")
        lin = ET.SubElement(outer, f"{{{_KML_NS}}}LinearRing")
        coords = ET.SubElement(lin, f"{{{_KML_NS}}}coordinates")
        coords.text = " ".join(f"{lo:.9f},{la:.9f},0" for lo, la in ring)
    tmp = path + ".tmp"
    ET.ElementTree(kml).write(tmp, xml_declaration=True, encoding="utf-8")
    import os

    os.replace(tmp, path)


def read_kml_polygons(path: str) -> "tuple[list[np.ndarray], list[str]]":
    """Parse Placemark polygons back: list of (N, 2) (lon, lat) rings +
    names.  Handles the namespace-qualified layout this sink writes and
    plain un-namespaced KML."""
    tree = ET.parse(path)

    def findall(el, tag):
        return el.findall(f".//{{{_KML_NS}}}{tag}") or el.findall(f".//{tag}")

    rings, names = [], []
    for pm in findall(tree.getroot(), "Placemark"):
        nm = findall(pm, "name")
        names.append(nm[0].text if nm else "")
        coords = findall(pm, "coordinates")
        if not coords:
            continue
        pts = []
        for tok in (coords[0].text or "").split():
            parts = tok.split(",")
            pts.append((float(parts[0]), float(parts[1])))
        rings.append(np.asarray(pts, dtype=np.float64))
    return rings, names
