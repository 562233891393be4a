import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    # 8 cpus, not 4: Ray Data's hash-shuffle join reserves aggregator
    # actors alongside map actor pools; at 4 cpus a long session can
    # starve into a scheduling deadlock (observed once across ~250 tests)
    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()
