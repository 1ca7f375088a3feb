import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (local mode)."""
    import ray
    # 8 cpus, not 4: Ray 2.49's hash-shuffle join scheduling has been
    # observed to deadlock intermittently when several shuffle/join
    # operators compete for a 4-cpu budget
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    yield ray
    ray.shutdown()
