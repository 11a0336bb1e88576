"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

from __future__ import annotations

import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def miniworld(tmp_path_factory):
    from drivers_of_global_deforestation_ray.sources.miniworld import build_miniworld

    root = str(tmp_path_factory.mktemp("world"))
    return build_miniworld(root)
