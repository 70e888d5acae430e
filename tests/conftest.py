import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_transcripts():
    """Deterministic tiny corpus shared by tests (200 conversations)."""
    from aushape_ray.fixtures import generate_transcripts

    return generate_transcripts(200)


@pytest.fixture(scope="session")
def oracle_events(tiny_transcripts):
    from aushape_ray.oracle import assemble_events

    return assemble_events(tiny_transcripts)
