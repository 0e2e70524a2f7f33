"""Session-scoped Ray fixture (ONE ray.init per pytest session) + data fixtures."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def clean_dir(tmp_path_factory):
    from seronet_data_validator_ray.datagen import generate_sequences

    d = "/tmp/svr_fixtures/clean"
    generate_sequences(d, n_rows=10_000, seed=42, bad=False)
    return d


@pytest.fixture(scope="session")
def bad_dir(tmp_path_factory):
    from seronet_data_validator_ray.datagen import generate_sequences

    d = "/tmp/svr_fixtures/bad"
    generate_sequences(d, n_rows=10_000, seed=42, bad=True)
    return d


@pytest.fixture(scope="session")
def reference_hists(clean_dir):
    from seronet_data_validator_ray.datagen import compute_reference_histograms

    return compute_reference_histograms(clean_dir)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
