import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(__file__))  # make `oracle` importable


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from rayrank import configure_data_context

    configure_data_context()
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_graph_dir(tmp_path):
    return str(tmp_path / "graph")
