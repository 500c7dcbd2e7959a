import os

import pytest

os.environ.setdefault("RAY_DEDUP_LOGS", "0")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_pages(tmp_path_factory):
    """200-row deterministic pages table parquet (FIXTURES.md F1 pages_tiny)."""
    from indexer_ray.sources.pages import generate_pages_parquet

    path = str(tmp_path_factory.mktemp("pages") / "pages_tiny.parquet")
    generate_pages_parquet(path, n_rows=200, seed=42)
    return path


@pytest.fixture(scope="session")
def small_pages(tmp_path_factory):
    """2k-row pages table for e2e rank-identity tests (scaled-down F1 small)."""
    from indexer_ray.sources.pages import generate_pages_parquet

    path = str(tmp_path_factory.mktemp("pages") / "pages_small.parquet")
    generate_pages_parquet(path, n_rows=2000, seed=42)
    return path
