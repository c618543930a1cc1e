import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract: library
    code never inits; tests own their session here).

    Known environmental flake, observed ~1/1500 test executions: Ray
    Data's threaded file readers can race fsspec's first import inside a
    fresh worker ("partially initialized module 'fsspec' has no attribute
    'utils'"). A worker_process_setup_hook preloading fsspec was tried and
    HANGS local-mode sessions (the hook needs the runtime-env agent);
    re-run the affected test on hit."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    from pie_ray.util import tune_data_context

    tune_data_context()
    yield
    ray.shutdown()
