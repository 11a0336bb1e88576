"""Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``TheSustainabilityConsortium/Drivers-of-Global-Deforestation`` (the Curtis et
al. 2018 forest-loss-driver workflow, ``/root/reference/Supplemental_Data_1.R``)
re-targeted onto a Common-Crawl-style Parquet corpus of web pages, built on
``ray.data.Dataset`` pipelines:

- ``functions/``  pure vectorized kernels (tile codec, geocode, text extract,
  text analytics, hashing/sketches) — no Ray dependency, unit-testable.
- ``state/``      stateful components held by actor pools (STRtree + PIP,
  raster registry, CART trees).
- ``stages/``     Dataset combinators (relational ops, dedup, similarity,
  scoring, smoothing, multimodal plumbing).
- ``sources/``    synthetic corpus generators, raster IO, checkpoint manifests.
- ``pipelines/``  the flagship tile-classification pipeline + a straight-line
  numpy/pandas golden implementation used for parity tests.

Nothing in this package calls ``ray.init`` / ``ray.shutdown``; sessions are
owned by the driver harness, ``bench.py`` and the pytest fixture.
"""

__version__ = "0.1.0"
