from __future__ import annotations

import pyarrow.parquet as pq
import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir():
    from horizon_ocr_python_ray import ensure_corpus

    return ensure_corpus(0.001)


@pytest.fixture(scope="session")
def golden_map(corpus_dir):
    t = pq.read_table(corpus_dir + "/golden.parquet")
    return {r["url"]: r for r in t.to_pylist()}
