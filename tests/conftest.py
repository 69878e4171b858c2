import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
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
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t2_rows():
    from probe_ray.corpus import generate_rows

    return generate_rows("t2")


@pytest.fixture(scope="session")
def t2_index(ray_session, tmp_path_factory):
    """Build the t2 index once per test session."""
    from probe_ray.build import build_index
    from probe_ray.corpus import write_corpus

    root = tmp_path_factory.mktemp("t2idx")
    corpus_path = str(root / "corpus.parquet")
    write_corpus(corpus_path, "t2")
    # ngram_index=True: substring candidate generation is complete on t2
    # (t1 stays without it to cover the legacy dictionary-scan path)
    return build_index(corpus_path, str(root / "index"), ngram_index=True)


@pytest.fixture(scope="session")
def t1_index(ray_session, tmp_path_factory):
    from probe_ray.build import build_index
    from probe_ray.corpus import write_corpus

    root = tmp_path_factory.mktemp("t1idx")
    corpus_path = str(root / "corpus.parquet")
    write_corpus(corpus_path, "t1")
    return build_index(corpus_path, str(root / "index"))
