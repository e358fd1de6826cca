"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    from rindex.fixtures import write_corpus

    d = tmp_path_factory.mktemp("corpus") / "small"
    write_corpus(str(d), "small")
    return str(d)


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    from rindex.fixtures import write_corpus

    d = tmp_path_factory.mktemp("corpus_tiny") / "tiny"
    write_corpus(str(d), "tiny")
    return str(d)
