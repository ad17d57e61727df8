import numpy as np
import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (contract: tests init
    Ray exactly once)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
