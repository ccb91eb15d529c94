"""Session-scoped Ray + shared fixture index (built once per session)."""

from __future__ import annotations

import shutil

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


N_FIXTURE_ROWS = 900
NUM_PARTS = 4
NUM_SHARDS = 2


@pytest.fixture(scope="session")
def pages():
    from miru_ray.sources.fixtures import pages_table
    return pages_table(N_FIXTURE_ROWS)


@pytest.fixture(scope="session")
def index_dir(ray_session, pages, tmp_path_factory):
    from miru_ray.pipelines.build import BuildConfig, build_index
    d = str(tmp_path_factory.mktemp("idx") / "index")
    shutil.rmtree(d, ignore_errors=True)
    build_index(pages, d, BuildConfig(num_parts=NUM_PARTS, num_shards=NUM_SHARDS))
    return d


@pytest.fixture(scope="session")
def oracle(pages):
    from miru_ray.oracle import OracleIndex
    return OracleIndex(pages, num_parts=NUM_PARTS)


@pytest.fixture(scope="session")
def reader(index_dir):
    from miru_ray.state.reader import IndexReader
    return IndexReader(index_dir)
