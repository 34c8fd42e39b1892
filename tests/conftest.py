import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, log_to_driver=False)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def synth_small(tmp_path_factory):
    """Deterministic small transcript corpus shared across tests."""
    from ai_bangladesh_address_parser_ray.sources.synthetic import (
        write_transcript_tables,
    )

    out = str(tmp_path_factory.mktemp("synth") / "sf_test")
    return write_transcript_tables(
        out, seed=42, n_convs=120, turns_per_conv=8, n_entities=40)
