import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (never per-test)."""
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
def small_cfg():
    from langscrape_ray.sources.fixtures_gen import FixtureConfig

    return FixtureConfig(n_pages=300, n_hosts=10, n_seeds=30)


@pytest.fixture(scope="session")
def small_world(small_cfg):
    """(pages_table, seeds_table, robots_table) for the small fixture web."""
    from langscrape_ray.sources.fixtures_gen import (
        build_pages_table,
        build_robots_table,
        build_seeds_table,
    )

    return (
        build_pages_table(small_cfg),
        build_seeds_table(small_cfg),
        build_robots_table(small_cfg),
    )
